"""Lance-logical table adapter (SURVEY.md §7 consequence (b)).

The north rule speaks of Lance tables of interleaved documents; the
sandbox has no ``lance`` wheel, so the adapter keeps the logical schema
identical and switches the physical format: Lance when importable,
Parquet otherwise.  All pipeline code goes through these functions, so a
Lance-enabled environment is a zero-code-change swap.
"""

from __future__ import annotations

import ray.data

try:  # pragma: no cover - lance is absent in this container
    import lance  # noqa: F401
    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_documents(path: str | list[str], columns: list[str] | None = None
                   ) -> "ray.data.Dataset":
    """Read an interleaved-documents table (doc_id, spans).  ``path`` may
    be a directory, a file, or a list of fragment paths (a Lance dataset
    is a single rooted directory — fragment lists only apply to the
    parquet fallback; shard a Lance table with its native fragment API)."""
    if HAVE_LANCE and isinstance(path, str):
        ds = ray.data.read_lance(path, columns=columns)
        return ds
    return ray.data.read_parquet(path, columns=columns)


def write_table(ds: "ray.data.Dataset", path: str) -> None:
    """Write a result table; directory of fragments, never one file."""
    if HAVE_LANCE:
        ds.write_lance(path)
        return
    ds.write_parquet(path)
