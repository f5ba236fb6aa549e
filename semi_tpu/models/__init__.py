"""Model registry: YAML section name -> model class.

Mirrors the reference's ``globals()[name](**config[name])`` dispatch
(train.py:55-58) with explicit registration and kwarg validation.
"""

from semi_tpu.models.base import StreamingModel
from semi_tpu.models.beamformer import GeneralBeamformer, MVDRBeamformer
from semi_tpu.models.complex_crn import ComplexTemporalCRN
from semi_tpu.models.crn import (TemporalCRN, TemporalCRNDirectional,
                                 TemporalCRNSpk, TemporalCRNSpkDeep,
                                 TemporalCRNSpkXAttn, TemporalCRNv1)
from semi_tpu.models.fullsubnet import FullSubNet
from semi_tpu.models.gtsa import GTSA

MODEL_REGISTRY: dict[str, type] = {
    "TemporalCRN": TemporalCRN,
    # the reference ships two models named TemporalCRN (CRN.py v1 and
    # CRN_ELU.py); train.py imports the ELU one. The v1 family member
    # gets a distinct section name here.
    "TemporalCRN_v1": TemporalCRNv1,
    # beyond-reference: directional input features (cos/sin IPD + ILD)
    # targeting the measured babble target-ambiguity failure mode
    "TemporalCRN_dir": TemporalCRNDirectional,
    # beyond-reference: target-speaker conditioning (enrollment channel
    # + time-pooled voice embedding + bottleneck FiLM) — the identity
    # route to the babble gap after the directional ceiling ruled out
    # spatial cues (docs/BENCHMARKS.md "Directional-oracle ceiling")
    "TemporalCRN_spk": TemporalCRNSpk,
    # deep-FiLM conditioning: identity modulates every encoder stage
    # (the round-4 enrollment-quality bound located the constraint in
    # conditioning capacity, not enrollment extraction)
    "TemporalCRN_spk_deep": TemporalCRNSpkDeep,
    # deep FiLM + bottleneck cross-attention to enrollment FRAMES: the
    # round-5 lever against the remaining babble identity gap (pooled
    # FiLM tops out at +1.79 dB vs the +39.7 dB cIRM oracle — the
    # per-frame memory lets mixture frames match spectral exemplars of
    # the target voice instead of one summary vector)
    "TemporalCRN_spk_xattn": TemporalCRNSpkXAttn,
    "FullSubNet": FullSubNet,
    "GTSA": GTSA,
    "GeneralBeamformer": GeneralBeamformer,
    "Complex_TemporalCRN": ComplexTemporalCRN,
}


def build_model(name: str, section: dict):
    from semi_tpu.utils.config import validate_model_section

    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model '{name}'; registered: {sorted(MODEL_REGISTRY)}")
    cls = MODEL_REGISTRY[name]
    kwargs = validate_model_section(cls, section, name)
    return cls(**kwargs)


__all__ = ["StreamingModel", "TemporalCRN", "MODEL_REGISTRY", "build_model"]
