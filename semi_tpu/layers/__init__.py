from semi_tpu.layers.module import Module, detach
from semi_tpu.layers.norms import CumLayerNorm, GlobalLayerNorm
from semi_tpu.layers.conv import (
    TemporalConv1d,
    TemporalConv2d,
    TemporalConvTranspose2d,
    conv2d,
    conv_transpose2d,
)
from semi_tpu.layers.rnn import GRU, LSTM, SequenceModel
from semi_tpu.layers.attention import MultiheadAttention, TransformerLayer
from semi_tpu.layers.linear_t import LinearT
from semi_tpu.layers.complex import (
    ComplexGlobalLayerNorm,
    ComplexSequenceModel,
    ComplexTemporalConv2d,
    ComplexTemporalConvTranspose2d,
)

__all__ = [
    "Module",
    "detach",
    "CumLayerNorm",
    "GlobalLayerNorm",
    "TemporalConv1d",
    "TemporalConv2d",
    "TemporalConvTranspose2d",
    "conv2d",
    "conv_transpose2d",
    "GRU",
    "LSTM",
    "SequenceModel",
    "MultiheadAttention",
    "TransformerLayer",
    "LinearT",
    "ComplexGlobalLayerNorm",
    "ComplexSequenceModel",
    "ComplexTemporalConv2d",
    "ComplexTemporalConvTranspose2d",
]
