"""Reference implementations for the per-chip raster queries (filled in
incrementally; see textref/annref for the pattern)."""

from __future__ import annotations

GOLDENS: dict = {}
