"""Composed Ray Data pipelines (the CLI-entry-point analogues)."""

from pypdfium2_ray.pipelines.extract_text import extract_pipeline, read_cc_pages  # noqa: F401
