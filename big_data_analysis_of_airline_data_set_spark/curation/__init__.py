"""Corpus-curation operators beyond per-document gates: sampling
(per-domain quotas, mixture rebalancing), sequence packing, and
benchmark-contamination checks — the ops a training-data pipeline runs
AFTER quality filtering and dedup, when assembling the final mixture.

No reference analogue (the reference stops at cleaning + per-column
stats, Scripts/1_cs_777_cleaning_data.py); these extend the engine
toward LLM-corpus workloads per the build brief.
"""

from .contamination import contamination_hits
from .packing import pack_sequences
from .sampling import domain_mixture, quota_sample

__all__ = [
    "contamination_hits",
    "domain_mixture",
    "pack_sequences",
    "quota_sample",
]
