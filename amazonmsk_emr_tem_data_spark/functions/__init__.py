from .codec import from_kafka_envelope, to_kafka_envelope
from .tem import horizontal_mean, with_tem_avg

__all__ = [
    "from_kafka_envelope",
    "to_kafka_envelope",
    "horizontal_mean",
    "with_tem_avg",
]
