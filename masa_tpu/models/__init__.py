"""Scoring / recurrence model definitions."""

from masa_tpu.models.scoring import (
    border_cells,
    encode_sequence,
    match_column,
)

__all__ = ["border_cells", "encode_sequence", "match_column"]
