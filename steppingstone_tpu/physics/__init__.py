from steppingstone_tpu.physics.model import RobotModel
