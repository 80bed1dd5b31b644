"""Ray Data stages: stateful map_batches actor classes + routing helpers."""

from pypdfium2_ray.stages.extract import ExtractText, EXTRACTED_SCHEMA, add_html_len  # noqa: F401
from pypdfium2_ray.stages.skew import split_extract  # noqa: F401
from pypdfium2_ray.stages.dedup import dedup_by_url  # noqa: F401
