from tfhe_tpu.parallel.mesh import make_mesh
from tfhe_tpu.parallel.sharded import make_sharded_pbs_step
from tfhe_tpu.parallel.dispatch import PbsDispatcher
