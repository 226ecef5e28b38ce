from matt3r_data_ingestion_serverless_spark.operators.stationary import stationary_intervals
from matt3r_data_ingestion_serverless_spark.operators.autopilot import ap_transitions

__all__ = ["stationary_intervals", "ap_transitions"]
