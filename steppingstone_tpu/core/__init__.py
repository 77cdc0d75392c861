from steppingstone_tpu.core import quaternion, spatial
