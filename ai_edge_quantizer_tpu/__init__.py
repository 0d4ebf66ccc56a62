"""TPU-native post-training quantization framework (AEQ-capability parity)."""

from ai_edge_quantizer_tpu.quantizer import QuantizationResult
from ai_edge_quantizer_tpu.quantizer import Quantizer

__all__ = ['Quantizer', 'QuantizationResult']
__version__ = '0.1.0'
