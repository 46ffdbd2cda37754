"""Runtime configuration.

The reference resolves its runtime parameters (Kafka broker string,
S3 bucket) from AWS SSM Parameter Store at startup in every script
(``/root/reference/pyspark_scripts/temDataRead.py:85-95``,
``03_temStreamEveryMin.py:106-114``). This engine has no cloud
dependency: configuration is a plain dataclass populated from explicit
arguments or environment variables, so the same pipeline code runs on a
laptop, CI, or a 1000-executor cluster unchanged.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    """Everything the pipelines need to know about their environment."""

    # Kafka transport (only used when a broker is actually configured).
    kafka_bootstrap_servers: str | None = None
    kafka_topic: str = "exp.tem1.spark.streaming"  # reference topic name,
    # declared at /root/reference/pyspark_scripts/temDataRead.py:12
    kafka_security: dict[str, str] = field(default_factory=dict)

    # Storage roots (local dirs or any Hadoop-FS URI: s3a://, hdfs://, ...).
    data_dir: str = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    output_dir: str = "/tmp/amazonmsk_emr_tem_data_spark/output"
    checkpoint_dir: str = "/tmp/amazonmsk_emr_tem_data_spark/checkpoints"

    # Streaming cadence (reference: 1-minute processing-time batches,
    # /root/reference/pyspark_scripts/03_temStreamEveryMin.py:97).
    trigger_interval: str = "1 minute"

    # Incremental-replay cadence (reference: one row per 0.5 s,
    # /root/reference/pyspark_scripts/04_temincrementaltem.py:19).
    replay_rows_per_second: float = 2.0

    @staticmethod
    def from_env() -> "PipelineConfig":
        return PipelineConfig(
            kafka_bootstrap_servers=os.environ.get("KAFKA_BOOTSTRAP_SERVERS"),
            kafka_topic=os.environ.get("KAFKA_TOPIC", "exp.tem1.spark.streaming"),
            data_dir=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        )
