from steppingstone_tpu.parallel.mesh import make_mesh, env_sharding, replicated
