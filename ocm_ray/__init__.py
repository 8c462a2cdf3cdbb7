"""ocm-ray: Ray-Data-native distributed sketch / approximate-aggregation
library (see README.md). Top-level conveniences re-export the sketch
family and the main engine entry points."""

__version__ = "0.1.0"

from ocm_ray.sketches import (  # noqa: F401
    KLL,
    BloomFilter,
    BottomKMinHash,
    CountMin,
    CountSketch,
    HyperLogLog,
    MergeableSketch,
    OfflineCountMin,
    TDigest,
    TopK,
)


def __getattr__(name):
    # lazy engine imports so `import ocm_ray` works without ray initialized
    if name in ("build_sketch", "build_sketch_sharded", "SketchAggregate",
                "grouped_sketches"):
        from ocm_ray.engine import build

        return getattr(build, name)
    if name == "build_ocm":
        from ocm_ray.engine.rounds import build_ocm

        return build_ocm
    if name == "attach_estimates":
        from ocm_ray.engine.query import attach_estimates

        return attach_estimates
    raise AttributeError(name)
