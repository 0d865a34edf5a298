from nifi_dicom_spark.fixtures.generator import GeneratorConfig, generate_change_events, write_event_files
from nifi_dicom_spark.fixtures.oracle import replay_oracle

__all__ = [
    "GeneratorConfig",
    "generate_change_events",
    "write_event_files",
    "replay_oracle",
]
