from tfhe_tpu.ops.polynomial import NegacyclicEngine, get_engine
from tfhe_tpu.ops.folded_ntt import FoldedCrtEngine, get_folded_engine
