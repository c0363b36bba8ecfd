from rfw_tpu.parallel.mesh import film_mesh, render_sample_sharded, shard_rays
