from speinet_tpu.parallel.mesh import make_mesh, batch_sharding, replicate_sharding
from speinet_tpu.parallel.chop import chop_batch, chop_merge
