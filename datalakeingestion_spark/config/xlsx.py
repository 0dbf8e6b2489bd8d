"""Minimal pure-stdlib xlsx I/O for the control plane.

The reference's control table lives in an Excel sheet: read via
``pd.read_excel`` / ``wr.s3.read_excel`` (utils/aws_utils.py:265-299) and
written back with ``to_excel`` (utils/aws_utils.py:246-259), called from
the config updater (update_config.py:322-326). A user migrating the
reference's actual control file therefore arrives holding an ``.xlsx``.

openpyxl is not in this environment, and the control plane must not gate
its primary migration path behind an optional import — so this module
speaks the subset of SpreadsheetML a config sheet actually uses, with
nothing but ``zipfile`` + ``xml.etree``:

- **write**: one worksheet, inline strings only (no sharedStrings table),
  header row + data rows — byte-deterministic for a given table (fixed
  zip timestamps), so control-file writes are diffable artifacts.
- **read**: any single-sheet producer — handles inline strings
  (``t="inlineStr"``), sharedStrings (``t="s"``, what pandas/openpyxl
  emit), formula-cached strings (``t="str"``), booleans and numbers, and
  sparse rows via the ``r="D7"`` cell references (missing cells are
  ``None``, trailing gaps padded to header width).

This is a CONTROL-PLANE codec: sheets are tiny (tens of rows), driver-
side, never a data path — data-plane xlsx stays behind the spark-excel /
openpyxl seam in ``sources/files.py``.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" '
    'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
    'Target="xl/workbook.xml"/></Relationships>'
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
    'relationships"><Relationship Id="rId1" Type="http://schemas.'
    'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/></Relationships>'
)


_X_ESCAPE_RE = re.compile(r"_x[0-9A-Fa-f]{4}_")
# XML 1.0 cannot carry most control chars even entity-escaped; OOXML's
# convention (what openpyxl/Excel emit) is _xHHHH_ with literal _xHHHH_
# sequences self-escaped as _x005F_xHHHH_
# \x0d (\r) included: XML 1.0 parsers NORMALIZE \r and \r\n to \n in
# text content, so an unescaped \r would silently round-trip changed
_CTRL_RE = re.compile(r"[\x00-\x08\x0b-\x0d\x0e-\x1f\x7f]")


def _x_escape(s: str) -> str:
    s = _X_ESCAPE_RE.sub(lambda m: "_x005F_" + m.group(0)[1:], s)
    return _CTRL_RE.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)


def _x_unescape(s: str) -> str:
    return _X_ESCAPE_RE.sub(
        lambda m: chr(int(m.group(0)[2:6], 16)), s
    )


def _col_letters(idx: int) -> str:
    """0-based column index -> A, B, ..., Z, AA, ..."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _ref_to_col(ref: str) -> int:
    """'D7' -> 3 (0-based column)."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - ord("A") + 1)
    return n - 1


def write_xlsx(
    path: str,
    header: list[str],
    rows: list[list],
    sheet_name: str = "Sheet1",
) -> None:
    """Write one worksheet: header + rows. Numbers and booleans keep
    their native SpreadsheetML cell types (so types survive a
    round-trip); everything else is an inline string. Deterministic
    bytes."""
    def cell(r: int, c: int, v) -> str:
        if v is None:
            return ""
        ref = f"{_col_letters(c)}{r}"
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, int):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if isinstance(v, float):
            num = repr(int(v)) if v.is_integer() else repr(v)
            return f'<c r="{ref}"><v>{num}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(_x_escape(str(v)))}</t></is></c>"
        )

    body = []
    for r_idx, row in enumerate([list(header)] + [list(r) for r in rows]):
        cells = "".join(cell(r_idx + 1, c, v) for c, v in enumerate(row))
        body.append(f'<row r="{r_idx + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        f'<sheet name={quoteattr(sheet_name)} sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    fixed_date = (1980, 1, 1, 0, 0, 0)  # deterministic zip entries
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in [
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("_rels/.rels", _ROOT_RELS),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS),
            ("xl/worksheets/sheet1.xml", sheet),
        ]:
            info = zipfile.ZipInfo(name, date_time=fixed_date)
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    v = c.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return _x_unescape(
            "".join(t_el.text or "" for t_el in is_el.iter(f"{_NS}t"))
        )
    if v is None or v.text is None:
        return None
    if t == "s":
        return _x_unescape(shared[int(v.text)])
    if t == "b":
        return v.text == "1"
    if t in ("str", "e"):
        return _x_unescape(v.text)
    # numeric: preserve ints exactly (Excel stores 7 as "7")
    txt = v.text
    try:
        return int(txt)
    except ValueError:
        return float(txt)


def read_xlsx(path: str) -> tuple[list[str], list[list]]:
    """Read the FIRST worksheet -> (header, rows). Rows are padded with
    ``None`` to header width; sparse cells resolved via their ``r=``
    references, so producer quirks (skipped empty cells) round-trip."""
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        # resolve the first sheet via workbook rels when present; fall
        # back to the conventional path
        sheet_path = "xl/worksheets/sheet1.xml"
        if "xl/_rels/workbook.xml.rels" in names and "xl/workbook.xml" in names:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
            first = wb.find(f"{_NS}sheets/{_NS}sheet")
            rid = first.get(
                "{http://schemas.openxmlformats.org/officeDocument/2006/"
                "relationships}id"
            )
            rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
            for rel in rels:
                if rel.get("Id") == rid:
                    target = rel.get("Target").lstrip("/")
                    sheet_path = (
                        target if target.startswith("xl/") else f"xl/{target}"
                    )
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                )
        root = ET.fromstring(zf.read(sheet_path))
        # honor the r= ROW index when present: producers (Excel,
        # openpyxl) omit fully-empty <row> elements, and dropping them
        # would shift every later row up relative to pd.read_excel
        indexed: dict[int, list] = {}
        next_r = 1
        for row in root.iter(f"{_NS}row"):
            r_attr = row.get("r")
            r_idx = int(r_attr) if r_attr else next_r
            next_r = r_idx + 1
            vals: list = []
            for c in row.findall(f"{_NS}c"):
                ref = c.get("r")
                col = _ref_to_col(ref) if ref else len(vals)
                while len(vals) < col:
                    vals.append(None)
                vals.append(_cell_value(c, shared))
            indexed[r_idx] = vals
    if not indexed:
        return [], []
    last = max(indexed)
    out = [indexed.get(i, []) for i in range(1, last + 1)]
    header = [None if v is None else str(v) for v in out[0]]
    width = len(header)
    for i, r in enumerate(out[1:], start=2):
        extra = [v for v in r[width:] if v is not None]
        if extra:
            raise ValueError(
                f"row {i} has {len(extra)} value(s) beyond the "
                f"{width}-column header (first: {extra[0]!r}) — refusing "
                "to silently drop data in unnamed columns"
            )
    rows = [r[:width] + [None] * (width - len(r)) for r in out[1:]]
    return header, rows
