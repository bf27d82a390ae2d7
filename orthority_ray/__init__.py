"""orthority_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
leftfield-geospatial/orthority (reference at /root/reference, cited per-module
as ``file:line``) on top of ``ray.data.Dataset`` pipelines:

- ``core``       vectorized camera models, cell grid index, geometry kernels
- ``sources``    pages table synthesis + pruned parquet readers + param IO
- ``stages``     ``map_batches`` stages: extract, geocode, cell-index, PIP join,
                 kNN, tile assignment, dedup, text stats, ANN, covariance
- ``pipelines``  end-to-end flagship pipeline with lineage + resume
- ``state``      per-partition lineage manifests / checkpointing

Design rules (see SURVEY.md §7): zero-copy Arrow batches, stateless
``map_batches`` for pure column math, actor pools for stateful stages,
pre-aggregation before every ``groupby``, broadcast (``ray.put``) for small
sides, one shuffle key (``cell``) reused across stages, deterministic
(parallelism-invariant) outputs everywhere.

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the driver, ``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"
