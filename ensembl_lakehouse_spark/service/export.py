"""Multi-format result export with the reference's async state machine.

Reference behavior (app/main.py:280-358 + app/tasks.py:13-37):

- 7 formats: csv, tsv, xlsx, json, xml, feather, parquet
  (app/constants.py:3-10);
- export allowed only for SUCCEEDED queries (app/main.py:325-327);
- idempotence: artifact already exists → DONE immediately
  (app/main.py:338-340);
- otherwise a Redis state machine QUEUED → PROCESSING → DONE|FAILED
  keyed ``{query_id}.{format}`` (app/main.py:344-355,
  app/tasks.py:17,29,32), FAILED throttled for 60 s before retry is
  allowed (app/main.py:348-350, app/tasks.py:34-37);
- the Celery worker re-reads the result CSV with pandas and loses
  all types (app/tasks.py:19: ``pd.read_csv``).

Here the conversion runs on a thread pool straight from the *typed*
DataFrame — no CSV round-trip, so int64 stays int64 in parquet/
feather exports. csv/tsv/json/parquet use native distributed Spark
writers (scale to any result size); xlsx/xml/feather have no
distributed writer, so they take the pandas tail via Arrow
``toPandas()``, guarded by a row cap — exports are human-sized by
contract (the reference streams the whole CSV through one pandas
process too, so the cap is strictly more scalable than the
reference).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame

from ensembl_lakehouse_spark.service.cache import FAILED_EXPORT_RETRY_SECONDS, KVCache

# Reference SupportedFileFormats enum (app/constants.py:3-10).
REFERENCE_FILE_FORMATS = ("csv", "tsv", "xlsx", "json", "xml", "feather", "parquet")
# EXT: columnar formats the reference lacks but Spark writes natively
# (distributed, any result size). Kept separate so the reference's
# 7-format enum stays recognizable.
EXT_FILE_FORMATS = ("orc",)
SUPPORTED_FILE_FORMATS = REFERENCE_FILE_FORMATS + EXT_FILE_FORMATS

# States (app/main.py:344-355, app/tasks.py:17,29,32).
EXPORT_QUEUED = "QUEUED"
EXPORT_PROCESSING = "PROCESSING"
EXPORT_DONE = "DONE"
EXPORT_FAILED = "FAILED"

# Formats that require the single-process pandas tail.
_PANDAS_TAIL_FORMATS = {"xlsx", "xml", "feather"}
PANDAS_TAIL_ROW_CAP = 1_000_000


class UnsupportedFormat(ValueError):
    """422 in the reference's OpenAPI (the one endpoint keeping 422,
    app/main.py:52-68)."""


class QueryNotSucceeded(ValueError):
    """400: export requires the source query to be SUCCEEDED
    (app/main.py:330-331)."""


class ExportTooLarge(ValueError):
    """Pandas-tail formats are capped; distributed formats are not."""


class ExportManager:
    def __init__(
        self,
        export_dir: str,
        cache: KVCache | None = None,
        max_workers: int = 2,
        json_orient: str = "lines",
    ):
        # max_workers=2 mirrors the reference's celery --concurrency=2
        # (README.md:15); tune freely. json_orient="split" switches the
        # json format to the reference's byte format (app/tasks.py:23);
        # the default stays JSON Lines, the distributed-writer shape.
        self.export_dir = export_dir
        self.json_orient = json_orient
        self.cache = cache if cache is not None else KVCache()
        self._pool = ThreadPoolExecutor(max_workers=max_workers, thread_name_prefix="elh-export")
        self._lock = threading.Lock()
        os.makedirs(export_dir, exist_ok=True)

    # -- public -------------------------------------------------------

    def artifact_path(self, query_id: str, file_format: str) -> str:
        return os.path.join(self.export_dir, f"{query_id}.{file_format}")

    def request_export(self, query_id: str, df: DataFrame, file_format: str, query_state: str) -> dict:
        """The GET /query/{id}/export state machine (app/main.py:280-358).

        Returns ``{"status": ..., "result": path?}`` — the caller (API
        layer) maps DONE→200, QUEUED/PROCESSING→202, FAILED→the
        reference's retry message.
        """
        file_format = (file_format or "").lower().strip()
        if file_format not in SUPPORTED_FILE_FORMATS:
            raise UnsupportedFormat(
                f"file_format must be one of {SUPPORTED_FILE_FORMATS}, got {file_format!r}"
            )
        if query_state != "SUCCEEDED":
            raise QueryNotSucceeded(
                "Export is supported only for successfully executed queries!"
            )

        # State machine FIRST, existence second: Spark creates the
        # output directory at write START and leaves it behind on
        # failure, so a bare head-check would serve a partial/failed
        # artifact as DONE (and report DONE for a write still in
        # flight). The reference can head-check S3 first only because
        # S3 keys appear atomically on completion (app/main.py:338);
        # a filesystem/Spark writer must consult its own state while
        # it has one, and fall back to the head-check only for
        # artifacts from a previous process (no state recorded).
        path = self.artifact_path(query_id, file_format)
        state_key = f"{query_id}.{file_format}"
        with self._lock:
            state = self.cache.get(state_key)
            if state is None and os.path.exists(path):
                return {"status": EXPORT_DONE, "result": path}
            if state == EXPORT_DONE:
                return {"status": EXPORT_DONE, "result": path}
            if state == EXPORT_FAILED:
                # 60 s retry throttle: the FAILED key self-expires
                # (app/main.py:348-350) — until then, report FAILED.
                return {
                    "status": EXPORT_FAILED,
                    "detail": "you can try again after one minute interval!",
                }
            if state in (EXPORT_QUEUED, EXPORT_PROCESSING):
                return {"status": state}
            # Enqueue (app/main.py:352-355).
            self.cache.set(state_key, EXPORT_QUEUED)
            self._pool.submit(self._convert, query_id, df, file_format)
            return {"status": EXPORT_QUEUED}

    def wait_all(self) -> None:
        workers = self._pool._max_workers
        self._pool.shutdown(wait=True)
        self._pool = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="elh-export")

    # -- conversion (reference app/tasks.py:13-32) --------------------

    def _convert(self, query_id: str, df: DataFrame, file_format: str) -> None:
        state_key = f"{query_id}.{file_format}"
        self.cache.set(state_key, EXPORT_PROCESSING)
        path = self.artifact_path(query_id, file_format)
        try:
            write_export(df, path, file_format, json_orient=self.json_orient)
            self.cache.set(state_key, EXPORT_DONE)
        except Exception:
            # Remove the partial artifact a failed distributed write
            # leaves behind — after the FAILED throttle expires, the
            # no-state head-check path must not resurrect it as DONE.
            try:
                if os.path.isdir(path):
                    import shutil

                    shutil.rmtree(path, ignore_errors=True)
                elif os.path.exists(path):
                    os.remove(path)
            except OSError:
                pass
            self.cache.set(state_key, EXPORT_FAILED, ttl_seconds=FAILED_EXPORT_RETRY_SECONDS)


def write_export(df: DataFrame, path: str, file_format: str, *, json_orient: str = "lines") -> str:
    """Write ``df`` to ``path`` in the given format.

    Distributed writers (csv/tsv/json/parquet) write a directory of
    part files — correct at any scale; single-file formats
    (xlsx/xml/feather, and json with ``json_orient="split"``) take the
    Arrow toPandas tail with a row cap.
    """
    if file_format == "csv":
        df.write.mode("overwrite").option("header", True).csv(path)
    elif file_format == "tsv":
        df.write.mode("overwrite").option("header", True).option("sep", "\t").csv(path)
    elif file_format == "json":
        if json_orient == "split":
            # Reference byte format: pandas orient="split"
            # ({"columns":[...],"index":[...],"data":[...]},
            # app/tasks.py:23). Single-file by nature → pandas tail
            # with the row cap; byte compatibility comes from letting
            # pandas itself serialize, exactly as the reference does.
            _write_pandas_tail(df, path, "json_split")
        else:
            # Native writer emits JSON Lines — the scalable default
            # (a directory of part files any consumer can stream).
            df.write.mode("overwrite").json(path)
    elif file_format == "parquet":
        df.write.mode("overwrite").parquet(path)
    elif file_format == "orc":
        df.write.mode("overwrite").orc(path)
    elif file_format in _PANDAS_TAIL_FORMATS:
        _write_pandas_tail(df, path, file_format)
    else:
        raise UnsupportedFormat(file_format)
    return path


def _write_pandas_tail(df: DataFrame, path: str, file_format: str) -> None:
    # Cap before collecting: limit(cap+1) so the check costs O(cap).
    capped = df.limit(PANDAS_TAIL_ROW_CAP + 1).toPandas()
    if len(capped) > PANDAS_TAIL_ROW_CAP:
        raise ExportTooLarge(
            f"{file_format} export is capped at {PANDAS_TAIL_ROW_CAP} rows; "
            "use csv/parquet/json for larger results"
        )
    if file_format == "json_split":
        capped.to_json(path, orient="split")
    elif file_format == "feather":
        capped.to_feather(path)
    elif file_format == "xml":
        try:
            capped.to_xml(path, index=False)
        except ImportError as exc:  # lxml not installed in this container
            _write_xml_fallback(capped, path)
    elif file_format == "xlsx":
        try:
            capped.to_excel(path, index=False)
        except (ImportError, ModuleNotFoundError):
            # openpyxl absent (the reference depends on it,
            # requirements.txt:32): fall back to the vendored
            # std-lib OOXML writer so S7 stays a working format.
            _write_xlsx_minimal(capped, path)


def _write_xlsx_minimal(pdf, path: str) -> None:
    """Std-lib xlsx writer: one inline-string worksheet.

    XLSX is a zip of OOXML parts; this emits the minimal five
    (content types, package rels, workbook, workbook rels, sheet)
    that pandas.read_excel/Excel/LibreOffice all accept. Numbers are
    written as numeric cells, everything else as inline strings —
    matching what ``to_excel`` produces for a flat result table.
    """
    import zipfile
    from xml.sax.saxutils import escape

    def col_letter(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(65 + rem) + out
        return out

    rows_xml = []
    header = "".join(
        f'<c r="{col_letter(ci)}1" t="inlineStr"><is><t>{escape(str(col))}</t></is></c>'
        for ci, col in enumerate(pdf.columns)
    )
    rows_xml.append(f'<row r="1">{header}</row>')
    for ri, (_, row) in enumerate(pdf.iterrows(), start=2):
        cells = []
        for ci, col in enumerate(pdf.columns):
            val = row[col]
            ref = f"{col_letter(ci)}{ri}"
            if val is None or (isinstance(val, float) and val != val):
                cells.append(f'<c r="{ref}"/>')
            elif isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref}" t="inlineStr"><is><t>{escape(str(val))}</t></is></c>'
                )
        rows_xml.append(f'<row r="{ri}">{"".join(cells)}</row>')

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(rows_xml)}</sheetData></worksheet>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", pkg_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


def _xml_tag(col: str) -> str:
    """Sanitize a column name into a valid XML element name: invalid
    characters become '_', a leading digit gets a '_' prefix —
    without this, ``SELECT count(*)`` exports would emit
    ``<count(*)>`` which no parser accepts (pandas.to_xml enforces
    the same constraint by erroring; we sanitize instead so the
    export still completes)."""
    import re as _re

    tag = _re.sub(r"[^A-Za-z0-9_.\-]", "_", str(col)) or "_"
    if not (tag[0].isalpha() or tag[0] == "_"):
        tag = "_" + tag
    return tag


def _write_xml_fallback(pdf, path: str) -> None:
    """Minimal pandas.to_xml-compatible writer (lxml-free)."""
    from xml.sax.saxutils import escape

    with open(path, "w", encoding="utf-8") as fh:
        fh.write("<?xml version='1.0' encoding='utf-8'?>\n<data>\n")
        for _, row in pdf.iterrows():
            fh.write("  <row>\n")
            for col in pdf.columns:
                val = row[col]
                tag = _xml_tag(col)
                if val is None or (isinstance(val, float) and val != val):
                    fh.write(f"    <{tag}/>\n")
                else:
                    fh.write(f"    <{tag}>{escape(str(val))}</{tag}>\n")
            fh.write("  </row>\n")
        fh.write("</data>\n")
