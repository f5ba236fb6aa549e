from semi_tpu.data.dataset import LibriPartyDataset, MixPipeline
from semi_tpu.data.rir import RoomConfig, fft_convolve, sample_room, simulate_rir
from semi_tpu.data.wav import read_wav, write_wav

__all__ = [
    "LibriPartyDataset",
    "MixPipeline",
    "RoomConfig",
    "fft_convolve",
    "sample_room",
    "simulate_rir",
    "read_wav",
    "write_wav",
]
