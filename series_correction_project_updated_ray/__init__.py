"""Ray-Data-native time-series correction + rollup + retention engine.

A from-scratch rebuild of the capabilities of the reference repo
``abhimehro/series_correction_project_updated`` (Seatek sensor discontinuity
correction: gap / outlier / jump detection+correction, year-boundary level
shifts, sanitized exports), re-expressed as Ray Data pipelines over Arrow
batches, extended with the north-rule components: tumbling-window continuous
aggregates (1m/1h/1d), Gorilla/delta-of-delta segment compression,
per-partition lineage manifests, and large-scale training-data operators
(dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"
