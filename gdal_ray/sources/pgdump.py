"""PostGIS dump writer — the reference's ``ogr/ogrsf_frmts/pgdump``
driver (``ogrpgdumpdatasource.cpp``): SQL text a ``psql`` run can
load, with geometry as hex-encoded WKB through PostGIS's
``ST_GeomFromWKB(decode(...))`` and attributes COPY-escaped.

The writer emits, like the reference: ``CREATE TABLE`` with mapped
column types, an ``AddGeometryColumn``-style geometry registration,
then one ``COPY ... FROM STDIN`` block with tab-separated rows and
``\\.`` terminator (COPY is the reference's default ``--config
PG_USE_COPY YES`` fast path).
"""

from __future__ import annotations

import os

import pyarrow as pa

_PG_TYPES = [
    (pa.types.is_boolean, "BOOLEAN"),
    (pa.types.is_integer, "BIGINT"),
    (pa.types.is_floating, "DOUBLE PRECISION"),
    (pa.types.is_date, "DATE"),
    (pa.types.is_timestamp, "TIMESTAMP"),
]


def _pg_type(t: pa.DataType) -> str:
    for pred, name in _PG_TYPES:
        if pred(t):
            return name
    return "VARCHAR"


def _copy_escape(v) -> str:
    if v is None:
        return r"\N"
    s = str(v)
    return (s.replace("\\", "\\\\").replace("\t", r"\t")
            .replace("\n", r"\n").replace("\r", r"\r"))


def write_pgdump(path: str, table: pa.Table, *,
                 table_name: str = "features",
                 geom_col: str = "geometry",
                 srid: int = 0,
                 schema: str = "public") -> None:
    """Write a loadable SQL dump for one feature table.  ``geometry``
    is emitted as hex WKB into a ``geometry`` typed column (PostGIS
    accepts hex EWKB/WKB literals directly in COPY)."""
    attrs = [c for c in table.column_names if c != geom_col]
    qn = f'"{schema}"."{table_name}"'
    lines = [
        "SET standard_conforming_strings = ON;",
        f'DROP TABLE IF EXISTS {qn} CASCADE;',
        "BEGIN;",
        f'CREATE TABLE {qn} ( "ogc_fid" BIGINT PRIMARY KEY );',
    ]
    for c in attrs:
        t = _pg_type(table.schema.field(c).type)
        lines.append(f'ALTER TABLE {qn} ADD COLUMN "{c}" {t};')
    lines.append(
        f"SELECT AddGeometryColumn('{schema}','{table_name}',"
        f"'{geom_col}',{srid},'GEOMETRY',2);")
    cols = ['"ogc_fid"'] + [f'"{c}"' for c in attrs] + [f'"{geom_col}"']
    lines.append(f"COPY {qn} ({', '.join(cols)}) FROM STDIN;")
    wkbs = table.column(geom_col).to_pylist()
    acols = [table.column(c).to_pylist() for c in attrs]
    for i, b in enumerate(wkbs):
        row = [str(i + 1)]
        row += [_copy_escape(col[i]) for col in acols]
        row.append(b.hex().upper() if b else r"\N")
        lines.append("\t".join(row))
    lines += ["\\.", "COMMIT;"]
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
