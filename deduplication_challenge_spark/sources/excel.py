"""Excel (.xlsx) EXPLORATION sink — closes the reference's Excel export
surface (reference: src/helper.py:209 ``grouped.to_excel(file_name)``,
src/helper.py:457-468 ``save_to_excel``) without any third-party library:
a minimal SpreadsheetML writer over the stdlib ``zipfile`` (ECMA-376 /
ISO 29500, the public OOXML spec), inline strings only (no sharedStrings
part), one sheet.

Scope is deliberately the reference's: a DRIVER-SIDE export of a small
result frame for human exploration — group summaries, field dumps — not a
distributed sink (parquet is the scale sink, plans/pipeline.py).  The
writer therefore collects, and REFUSES loudly past ``max_rows`` instead of
silently truncating; Excel's own sheet limit (1,048,576 rows including the
header) is the hard ceiling.

Cell mapping: int/float -> numeric cells, bool -> boolean cells, None ->
blank, everything else (strings, timestamps, arrays) -> inline string of
``str(value)`` with XML-illegal control characters stripped.
"""

from __future__ import annotations

import datetime as _dt
import re
import zipfile
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

#: Excel's hard per-sheet row limit (header row included)
EXCEL_MAX_ROWS = 1_048_576

#: XML 1.0 forbids most C0 control characters even escaped
_ILLEGAL_XML = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _col_letter(idx: int) -> str:
    """0-based column index -> Excel letters (A, B, ..., Z, AA, ...)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell(col: int, row: int, value) -> str:
    ref = f"{_col_letter(col)}{row}"
    if value is None:
        return ""
    if isinstance(value, bool):  # before int: bool is an int subclass
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, int):
        if abs(value) >= 2**53:
            # Excel parses numeric cells as IEEE doubles — a 64-bit id
            # (e.g. doc_id = xxhash64(url)) would be silently rounded on
            # open.  Ship it as a string: exploration must not corrupt ids.
            return (
                f'<c r="{ref}" t="inlineStr"><is>'
                f"<t>{value}</t></is></c>"
            )
        return f'<c r="{ref}"><v>{value}</v></c>'
    if isinstance(value, float):
        if value != value or value in (float("inf"), float("-inf")):
            text = str(value)  # NaN/inf are not valid numeric cells
        else:
            return f'<c r="{ref}"><v>{value!r}</v></c>'
    elif isinstance(value, (_dt.datetime, _dt.date)):
        text = value.isoformat(sep=" ") if isinstance(value, _dt.datetime) else value.isoformat()
    else:
        text = str(value)
    text = escape(_ILLEGAL_XML.sub("", text))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_excel(
    df: DataFrame,
    path: str,
    sheet_name: str = "Sheet1",
    max_rows: int = 100_000,
) -> int:
    """Collect ``df`` on the driver and write a single-sheet .xlsx at the
    local ``path``; returns the number of data rows written.  Raises if the
    frame exceeds ``max_rows`` (never truncates silently) or ``max_rows``
    exceeds Excel's sheet capacity."""
    if not 0 < max_rows <= EXCEL_MAX_ROWS - 1:
        raise ValueError(
            f"max_rows must be in 1..{EXCEL_MAX_ROWS - 1} (Excel sheet "
            f"limit incl. header), got {max_rows}"
        )
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"frame exceeds max_rows={max_rows}; this is an exploration "
            "sink — aggregate or filter first, or use the parquet sink"
        )
    cols = df.columns
    # truncate the RAW name to Excel's 31-char limit BEFORE quoting —
    # truncating the quoted form could cut an XML entity in half; quoteattr
    # (not escape) handles '"' so the attribute can never break the XML
    raw_sheet = _ILLEGAL_XML.sub("", sheet_name)[:31] or "Sheet1"
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name={quoteattr(raw_sheet)} sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    ncols = len(cols)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        # stream the sheet row by row: the XML of a near-ceiling frame
        # would otherwise transiently hold the whole multi-GB document as
        # one driver-side string before compression
        with zf.open("xl/worksheets/sheet1.xml", "w") as out:
            out.write(
                b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                b"<sheetData>"
            )
            header = '<row r="1">' + "".join(
                _cell(ci, 1, name) for ci, name in enumerate(cols)
            ) + "</row>"
            out.write(header.encode("utf-8"))
            for ri, row in enumerate(rows, start=2):
                chunk = f'<row r="{ri}">' + "".join(
                    _cell(ci, ri, row[ci]) for ci in range(ncols)
                ) + "</row>"
                out.write(chunk.encode("utf-8"))
            out.write(b"</sheetData></worksheet>")
    return len(rows)
