from tfhe_tpu.ops.polynomial import NegacyclicEngine, get_engine
