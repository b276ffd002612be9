from gpscore.data.synthetic import sample_synthetic_1d, SyntheticSplit
from gpscore.data.kin40k import load_kin40k, kin40k_replicate_split, synthesize_kin40k_like

__all__ = [
    "sample_synthetic_1d",
    "SyntheticSplit",
    "load_kin40k",
    "kin40k_replicate_split",
    "synthesize_kin40k_like",
]
