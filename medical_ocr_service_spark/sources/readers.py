"""Readers/sinks re-expressing the reference's ingest surfaces (SURVEY §2.1).

* read_table           — parquet table loader (S1 family);
* read_csv_with_aliases — header-row alias-map CSV import (S3/S4,
  /root/reference/src/routes/v1/data-ingest.routes.js:487-574): incoming
  column headers are normalized and mapped through an alias dictionary;
* split_valid_invalid  — per-row required-field gate with an error side
  output carrying the row index (P7, data-ingest.routes.js:301-307);
* write_jsonl          — training-dataset JSONL sink (S11,
  /root/reference/src/services/auto-training.service.js:153-287);
* binary_file_source   — multipart/file source with extension+size filters
  (S5, src/config/multer.config.js).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _norm_header(h: str) -> str:
    return h.strip().lower().replace(" ", "_")


def read_csv_with_aliases(
    spark: SparkSession, path: str, alias_map: dict[str, str]
) -> DataFrame:
    """CSV with header; columns renamed through alias_map (normalized header ->
    canonical name); unmapped columns keep their normalized header."""
    df = spark.read.option("header", True).option("inferSchema", False).csv(path)
    renames = {}
    for c in df.columns:
        n = _norm_header(c)
        renames[c] = alias_map.get(n, n)
    return df.withColumnsRenamed(renames)


def _xlsx_local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _xlsx_cell_col(ref: str) -> int:
    """'BC12' -> 0-based column index (54)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _read_xlsx_rows(path: str) -> list[list[str | None]]:
    """Minimal pure-stdlib xlsx reader (zipfile + ElementTree): first
    worksheet, shared strings resolved, RICH TEXT runs flattened by
    concatenating their <t> fragments (the reference's rich-text
    flattening, data-ingest.routes.js:588-794), inline strings and raw
    numeric <v> values passed through as text."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root:
                if _xlsx_local(si.tag) != "si":
                    continue
                shared.append(
                    "".join(
                        t.text or ""
                        for t in si.iter()
                        if _xlsx_local(t.tag) == "t"
                    )
                )
        sheet_name = next(
            (
                n
                for n in sorted(names)
                if n.startswith("xl/worksheets/") and n.endswith(".xml")
            ),
            None,
        )
        if sheet_name is None:
            raise ValueError(f"{path}: no worksheet found in xlsx archive")
        root = ET.fromstring(z.read(sheet_name))

    rows: list[list[str | None]] = []
    for row in root.iter():
        if _xlsx_local(row.tag) != "row":
            continue
        cells: list[str | None] = []
        for c in row:
            if _xlsx_local(c.tag) != "c":
                continue
            idx = _xlsx_cell_col(c.get("r", ""))
            if idx < 0:
                idx = len(cells)
            while len(cells) <= idx:
                cells.append(None)
            ctype = c.get("t", "n")
            val: str | None = None
            if ctype == "inlineStr":
                val = "".join(
                    t.text or "" for t in c.iter() if _xlsx_local(t.tag) == "t"
                )
            else:
                v = next((x for x in c if _xlsx_local(x.tag) == "v"), None)
                if v is not None and v.text is not None:
                    val = (
                        shared[int(v.text)]
                        if ctype == "s"
                        else v.text
                    )
            cells[idx] = val
        rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_excel_with_aliases(
    spark: SparkSession, path: str, alias_map: dict[str, str]
) -> DataFrame:
    """S3/S4 xlsx half (data-ingest.routes.js:487-574; cargar_datos_excel.py):
    read the first Excel worksheet with a pure-stdlib parser (xlsx is a zip
    of XML — no engine dependency), apply the same alias column map as the
    CSV path, return a string-typed DataFrame. Rich-text headers/cells are
    flattened; duplicate post-alias headers are a hard error; an empty
    sheet yields an empty DataFrame with an explicit schema (inference
    would fail)."""
    rows = _read_xlsx_rows(path)
    header = [h if h is not None else "" for h in (rows[0] if rows else [])]
    cols = [alias_map.get(_norm_header(c), _norm_header(c)) for c in header]
    dupes = sorted({c for c in cols if cols.count(c) > 1})
    if dupes:
        raise ValueError(
            f"duplicate column names after alias normalization: {dupes}"
        )
    schema = ", ".join(f"`{c}` string" for c in cols) or "`_empty` string"
    data = [tuple(r[: len(cols)]) for r in rows[1:]]
    return spark.createDataFrame(data, schema=schema)


def with_global_row_index(
    df: DataFrame, col_name: str = "fila", order_col: str | None = None
) -> DataFrame:
    """1-based global row index WITHOUT a single-reducer global window.

    A `row_number() OVER (ORDER BY ...)` with no PARTITION BY funnels every
    row through one task — a scale-killer at 100 TB. Instead:

    1. optionally `orderBy(order_col)` (range-partitioned sort, parallel;
       range bounds come from fixed-seed reservoir sampling, so re-running
       the lineage yields the same partitioning);
    2. derive (partition, position) from `monotonically_increasing_id()`'s
       documented bit layout — partition id in the upper 31 bits, per-
       partition record position in the lower 33;
    3. compute per-partition row counts with a tiny aggregate (one row per
       partition), cumulative-sum them on the driver, and broadcast-join the
       offsets back.

    Two jobs over the input, zero wide shuffles of the data itself.

    The (partition, position) assignment is NONDETERMINISTIC lineage (the
    orderBy's range-sampling seed and monotonically_increasing_id both vary
    per execution), and it is consumed by TWO actions — the offsets collect
    here and the caller's eventual action. localCheckpoint materializes the
    assignment once and truncates the lineage, so both actions read the same
    partitions; without it the two executions can disagree and produce
    duplicate/skipped index values.
    """
    base = df.orderBy(order_col) if order_col is not None else df
    mid = F.monotonically_increasing_id()
    ids = base.withColumn("_pid", F.shiftright(mid, 33)).withColumn(
        "_pos", mid.bitwiseAND((1 << 33) - 1)
    ).localCheckpoint()
    counts = sorted(
        (r["_pid"], r["n"])
        for r in ids.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in counts:
        offsets.append((pid, acc))
        acc += n
    off_df = ids.sparkSession.createDataFrame(offsets or [(0, 0)], "_pid long, _off long")
    return (
        ids.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(col_name, F.col("_off") + F.col("_pos") + 1)
        .drop("_pid", "_pos", "_off")
    )


def split_valid_invalid(
    df: DataFrame, required: list[str], order_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, error_rows). Error rows carry `fila` (1-based input index,
    reference errores[] shape) and `error` naming the first missing field."""
    indexed = with_global_row_index(df, "fila", order_col)
    cond = None
    first_missing = F.lit(None).cast("string")
    for r in reversed(required):
        missing = F.col(r).isNull() | (F.col(r).cast("string") == "")
        first_missing = F.when(missing, F.lit(r)).otherwise(first_missing)
    for r in required:
        ok = F.col(r).isNotNull() & (F.col(r).cast("string") != "")
        cond = ok if cond is None else (cond & ok)
    valid = indexed.filter(cond).drop("fila")
    errors = indexed.filter(~cond).withColumn(
        "error", F.concat(F.lit("campo requerido faltante: "), first_missing)
    )
    return valid, errors.select("fila", "error", *df.columns)


def write_jsonl(df: DataFrame, path: str) -> None:
    """One JSON object per line (training dataset sink)."""
    df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.mode(
        "overwrite"
    ).text(path)


def fetch_url_payloads(
    df: DataFrame, url_col: str, out_col: str = "payload"
) -> DataFrame:
    """S6 URL-fetcher source (reference src/controllers/pre-visacion.
    controller.js:68-146: axios download of archivo_url -> temp file).

    Resolves a URL column to binary payloads executor-side via mapInPandas
    (fetches are batched and distributed, never driver-side). Schemes
    supported in this sandbox: ``file://`` (local/NFS read) and
    ``data:[mime];base64,`` (inline payloads). ``http(s)`` rows are
    environment-gated — no network egress here — and land in the
    ``fetch_error`` side column instead of failing the task (per-row
    isolation, same contract as the Q3 quarantine)."""
    import base64 as _b64
    from collections.abc import Iterator

    import pandas as pd

    fields = df.schema.fields

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errors = [], []
            for u in pdf[url_col]:
                try:
                    if u is None:
                        payloads.append(None)
                        errors.append("NULL_URL")
                    elif u.startswith("file://"):
                        with open(u[len("file://"):], "rb") as f:
                            payloads.append(f.read())
                        errors.append(None)
                    elif u.startswith("data:"):
                        head, _, body = u.partition(",")
                        if not head.endswith(";base64"):
                            raise ValueError("only base64 data: URIs")
                        payloads.append(_b64.b64decode(body))
                        errors.append(None)
                    elif u.startswith(("http://", "https://")):
                        payloads.append(None)
                        errors.append(
                            "SCHEME_GATED: no network egress in this "
                            "environment (http/https)"
                        )
                    else:
                        payloads.append(None)
                        errors.append(f"UNSUPPORTED_SCHEME: {u.split(':', 1)[0]}")
                except Exception as exc:  # noqa: BLE001 — per-row isolation
                    payloads.append(None)
                    errors.append(f"{type(exc).__name__}: {exc}"[:300])
            out = pdf.copy()
            out[out_col] = payloads
            out["fetch_error"] = errors
            yield out

    schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in fields
    ) + f", `{out_col}` binary, `fetch_error` string"
    return df.mapInPandas(run, schema=schema)


def binary_file_source(
    spark: SparkSession,
    path: str,
    allowed_ext: tuple[str, ...] = (".jpg", ".jpeg", ".png", ".pdf"),
    max_bytes: int = 10 * 1024 * 1024,
) -> DataFrame:
    """S5: binaryFile reader + extension/size gate (multer filter parity)."""
    df = spark.read.format("binaryFile").load(path)
    ext_ok = None
    for e in allowed_ext:
        c = F.lower(F.col("path")).endswith(e)
        ext_ok = c if ext_ok is None else (ext_ok | c)
    return df.filter(ext_ok & (F.col("length") <= max_bytes))
