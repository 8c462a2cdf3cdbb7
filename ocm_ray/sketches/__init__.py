"""Mergeable sketch family (UDAF state objects).

Importing this package registers every sketch kind for
``MergeableSketch.from_bytes`` deserialization.
"""

from ocm_ray.sketches.base import (
    CountCombiner,
    MergeableSketch,
    dedupe_counts,
    merge_all,
    merge_sorted_counts,
    sketch_class,
)
from ocm_ray.sketches.bbmh import BBitMinHash
from ocm_ray.sketches.pmh import ProbMinHash
from ocm_ray.sketches.bloom import BloomFilter, CountingBloomFilter, FilterHLL
from ocm_ray.sketches.countmin import CountMin, OfflineCountMin
from ocm_ray.sketches.countsketch import CountSketch, CountSketch4W, TopK
from ocm_ray.sketches.cws import WeightedMinHash
from ocm_ray.sketches.modvac import ModSketch, VACSketch
from ocm_ray.sketches.ddsketch import DDSketch
from ocm_ray.sketches.heavykeeper import HeavyKeeper, HeavyKeeperTopK
from ocm_ray.sketches.hbb import HyperBitBit
from ocm_ray.sketches.hll import HyperLogLog, SparseHLL
from ocm_ray.sketches.hyperminhash import HyperMinHash
from ocm_ray.sketches.kll import KLL, KLLPM
from ocm_ray.sketches.minhash import BottomKMinHash, CountingBottomKMinHash
from ocm_ray.sketches.pcsa import PCSA, ProbabilisticCounter
from ocm_ray.sketches.setsketch import SetSketch
from ocm_ray.sketches.tdigest import TDigest

__all__ = [
    "MergeableSketch", "merge_all", "dedupe_counts", "merge_sorted_counts",
    "CountCombiner", "sketch_class",
    "CountMin", "OfflineCountMin", "CountSketch", "TopK",
    "HyperLogLog", "BloomFilter", "CountingBloomFilter", "KLL", "KLLPM", "TDigest",
    "BottomKMinHash", "HeavyKeeper", "HeavyKeeperTopK", "DDSketch",
    "CountSketch4W", "PCSA", "ProbabilisticCounter", "FilterHLL",
    "HyperMinHash", "BBitMinHash", "SetSketch", "WeightedMinHash",
    "ProbMinHash", "CountingBottomKMinHash",
    "ModSketch", "VACSketch", "HyperBitBit", "SparseHLL",
]
