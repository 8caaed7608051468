from .base import SketchMergeError
from .bloom import BloomFilter
from .bottomk import BottomKSample
from .cms import CountMinSketch
from .countthenestimate import CountThenEstimate
from .hll import HllPlusPlus
from .kll import KLL
from .linear import LinearCounting, LogLog
from .spacesaving import SpaceSaving
from .tdigest import TDigest

__all__ = [
    "BloomFilter",
    "BottomKSample",
    "CountMinSketch",
    "CountThenEstimate",
    "HllPlusPlus",
    "KLL",
    "LinearCounting",
    "LogLog",
    "SketchMergeError",
    "SpaceSaving",
    "TDigest",
]

# uniform reference-wire import/export surface (lazy imports inside)
from .wire_export import EXPORTABLE, from_reference_wire, to_reference_wire  # noqa: E402

__all__ += ["EXPORTABLE", "from_reference_wire", "to_reference_wire"]

# reference-hash-family BUILD mode (JVM-compatible sketch state)
from .reference_family import (  # noqa: E402
    ReferenceFamilyAdaptiveCounting,
    ReferenceFamilyBloom,
    ReferenceFamilyCMS,
    ReferenceFamilyCTE,
    ReferenceFamilyHLLClassic,
    ReferenceFamilyLC,
    ReferenceFamilyLogLog,
)

__all__ += ["ReferenceFamilyAdaptiveCounting", "ReferenceFamilyBloom",
            "ReferenceFamilyCMS", "ReferenceFamilyCTE",
            "ReferenceFamilyHLLClassic", "ReferenceFamilyLC",
            "ReferenceFamilyLogLog"]
