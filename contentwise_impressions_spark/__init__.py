"""contentwise_impressions_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of the
ContentWise/contentwise-impressions experiment framework (CIKM 2020), expressed
Spark-first: every operator is a declarative DataFrame program optimized by
Catalyst/Tungsten/AQE rather than the reference's hand-fused Dask graphs and
NumPy/SciPy sparse kernels.

Layout
------
- ``sources``      — parquet/csv/json readers, canonical schemas, the
                     events→interactions adapter.
- ``operators``    — pure DataFrame→DataFrame relational operators (dedup,
                     splits, top-k, array ops, stats).
- ``functions``    — column-level expression builders (portable hashing,
                     text tokenization, similarity math helpers).
- ``plans``        — composed multi-operator pipelines (recommend pipeline,
                     statistics suite) mirroring the reference's entry points.
- ``recommenders`` — model-fit operators (TopPop … ALS/SLIM/EASE_R).
- ``evaluation``   — ranking/beyond-accuracy metrics as DataFrame aggregates.
- ``streaming``    — Structured Streaming ingestion extension.
- ``multimodal``   — binary-column (image/audio/video) plumbing.
"""

__version__ = "0.1.0"
