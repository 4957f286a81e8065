"""Extraction options (mirrors /root/reference/src/options.rs:1-50).

Scalar knobs only; in the Spark job the instance is closed over by the
vectorized UDF (no per-row variation), so it ships to executors once per
task via the serialized closure.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Options:
    """Defaults match ReadabilityOptions::default()
    (/root/reference/src/options.rs:36-50)."""

    debug: bool = False
    keep_classes: bool = False
    link_density_bias: float = 0.0
    max_elements: int | None = None
    min_text_length: int = 500
    n_top_candidates: int = 5
    preserved_classes: tuple[str, ...] = ("page",)
    use_json_ld: bool = True


DEFAULT_OPTIONS = Options()
