"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference serverless vehicle-telemetry pipeline
(haomingP/matt3r-Data-Ingestion-serverless), re-expressed Spark-first.

Layers (SURVEY.md §7.1):
  bronze  can_frames(device_id, ts, frame_id, bus_id, payload)
  silver  signals(device_id, ts, channel, values array<double>, state)
  gold    events(device_id, kind, start_ts, end_ts, payload)

Everything is declared with the DataFrame/SQL API so Catalyst picks the
physical strategy; Python code runs only inside the one genuine UDF
(the CANServer binary decoder) and clearly-marked multimodal stubs.
"""

from matt3r_data_ingestion_serverless_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
