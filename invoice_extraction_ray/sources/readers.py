"""Source layer: schema-validated readers for transcript corpora.

The reference validates input per file at load (`.png` extension check +
error on unreadable, reference ocr.py:309-318); here that becomes a schema
assertion at the Dataset boundary (SURVEY.md §2.1 S1-S5).  All readers prune
columns at the read so only needed bytes leave storage.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..config import input_schema

REQUIRED = ["conv_id", "turn_idx", "role", "text", "tool"]


class SchemaError(ValueError):
    pass


def validate_schema(schema: pa.Schema, required: list[str] = REQUIRED) -> None:
    """Fail fast (before any task runs) if the input can't feed the pipeline."""
    want = input_schema()
    missing = [n for n in required if n not in schema.names]
    if missing:
        raise SchemaError(f"transcript input missing columns: {missing}")
    for name in required:
        got_t = schema.field(name).type
        want_t = want.field(name).type
        if got_t != want_t:
            raise SchemaError(
                f"column {name!r}: expected {want_t}, input has {got_t}"
            )


def read_transcripts(
    paths,
    columns: list[str] | None = None,
    *,
    validate: bool = True,
    one_block_per_file: bool = False,
) -> ray.data.Dataset:
    """Parquet transcript reader with up-front schema validation.

    ``one_block_per_file`` maps each file to one block (required by the
    "aligned" seal strategy — see pipelines.extract.build_pipeline).
    """
    cols = columns or REQUIRED
    if validate:
        # footer-only schema check BEFORE any read task runs: clear error on
        # missing/mistyped columns instead of a mid-job task failure
        import pyarrow.dataset as pads

        validate_schema(pads.dataset(paths).schema, cols)
    kwargs = {}
    if one_block_per_file and isinstance(paths, (list, tuple)):
        kwargs["override_num_blocks"] = len(paths)
    return ray.data.read_parquet(paths, columns=cols, **kwargs)


def read_json_transcripts(paths, **read_kwargs) -> ray.data.Dataset:
    """JSONL transcript reader (reference S5 upload-source analogue): casts
    to the canonical schema so downstream stages see identical types."""
    ds = ray.data.read_json(paths, **read_kwargs)

    want = input_schema()

    def conform(t: pa.Table) -> pa.Table:
        cols = []
        for name in REQUIRED:
            if name in t.column_names:
                cols.append(t.column(name).cast(want.field(name).type))
            else:
                cols.append(pa.nulls(t.num_rows, want.field(name).type))
        return pa.Table.from_arrays(cols, names=REQUIRED)

    return ds.map_batches(conform, batch_format="pyarrow")
