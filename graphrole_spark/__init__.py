"""graphrole_spark — a PySpark-native temporal feature-engineering engine.

Re-expresses the capabilities of dkaslovsky/GraphRole (ReFeX recursive
feature extraction + RolX role assignment; see /root/reference) as Spark
DataFrame dataflow over transcript tables, designed for 100 TB-scale
inputs: point-in-time (as-of) semantics, sessionization, lag/lead
neighborhoods, distributed log-binning + feature pruning, and
block-partitioned NMF.

Public API (mirrors the reference's two exported classes,
reference: graphrole/__init__.py:1-2):

- :class:`graphrole_spark.operators.recursion.RecursiveFeatureExtractor`
- :class:`graphrole_spark.roles.extract.RoleExtractor`
- :func:`graphrole_spark.pipeline.extract_transcript_features`
"""

__version__ = "0.1.0"

__all__ = ["RecursiveFeatureExtractor", "RoleExtractor", "__version__"]


def __getattr__(name):  # PEP 562 lazy imports: keep numpy-only oracle usable
    if name == "RecursiveFeatureExtractor":    # without a JVM on the path
        from graphrole_spark.operators.recursion import RecursiveFeatureExtractor

        return RecursiveFeatureExtractor
    if name == "RoleExtractor":
        from graphrole_spark.roles.extract import RoleExtractor

        return RoleExtractor
    raise AttributeError(name)
