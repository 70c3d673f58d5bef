from tfhe_tpu.api.types import FheType, FHE_TYPES, type_from_bits
from tfhe_tpu.api.handles import FhevmHandle
from tfhe_tpu.api.instance import FhevmInstance, create_instance
