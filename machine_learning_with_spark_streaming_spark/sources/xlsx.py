"""Minimal pure-stdlib xlsx read/write (S2/K2 support path).

An .xlsx file is a zip of XML parts (ECMA-376 SpreadsheetML). The
reference reads lookup workbooks via pandas+openpyxl driver-side
(``pipeline/lib.py:92-101``); this container ships no xlsx codec, so
``read_xlsx_rows`` parses the parts directly with ``zipfile`` +
``xml.etree`` — handling the worksheet targets from the workbook rels,
shared/inline/formula strings, booleans and numbers, and sparse cells
(gaps padded by the cell reference column). Driver-side by design: these
are report/lookup-sized inputs feeding a distributed plan, never fact
tables.

``write_xlsx`` emits the complementary minimal workbook (shared-strings
table included, so round-trip tests exercise the reader's main string
path).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_DOC_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)[0-9]+")


def _col_index(ref: str | None) -> int | None:
    """0-based column index from a cell reference like ``BC23``."""
    if not ref:
        return None
    m = _CELL_REF.match(ref)
    if not m:
        return None
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _sheet_targets(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    by_id = {
        r.get("Id"): r.get("Target") for r in rels.findall(f"{_PKG_REL}Relationship")
    }
    out = []
    sheets = wb.find(f"{_MAIN}sheets")
    for s in sheets if sheets is not None else []:
        target = by_id[s.get(f"{_DOC_REL}id")]
        if not target.startswith("xl/"):
            target = "xl/" + target.lstrip("/")
        out.append((s.get("name"), target))
    return out


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        return [name for name, _ in _sheet_targets(z)]


def read_xlsx_rows(path: str, sheet: str | int = 0) -> list[list]:
    """Worksheet cell values as dense rows (None for gaps); strings,
    floats and bools typed as stored."""
    with zipfile.ZipFile(path) as z:
        targets = _sheet_targets(z)
        if isinstance(sheet, int):
            _, target = targets[sheet]
        else:
            lookup = dict(targets)
            if sheet not in lookup:
                raise KeyError(f"no sheet {sheet!r}; have {list(lookup)}")
            target = lookup[sheet]
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.findall(f"{_MAIN}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_MAIN}t")))
        ws = ET.fromstring(z.read(target))
        rows: list[list] = []
        for row in ws.iter(f"{_MAIN}row"):
            cells: dict[int, object] = {}
            for pos, c in enumerate(row.findall(f"{_MAIN}c")):
                ci = _col_index(c.get("r"))
                if ci is None:
                    ci = pos
                t = c.get("t", "n")
                v = c.find(f"{_MAIN}v")
                val: object
                if t == "s":
                    val = shared[int(v.text)] if v is not None else None
                elif t == "inlineStr":
                    val = "".join(tt.text or "" for tt in c.iter(f"{_MAIN}t"))
                elif t == "str":  # cached formula result
                    val = v.text if v is not None else None
                elif t == "b":
                    val = v is not None and v.text == "1"
                else:  # numeric
                    val = float(v.text) if v is not None and v.text else None
                cells[ci] = val
            width = max(cells) + 1 if cells else 0
            rows.append([cells.get(i) for i in range(width)])
        width = max((len(r) for r in rows), default=0)
        return [r + [None] * (width - len(r)) for r in rows]


def write_xlsx(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Minimal single-sheet workbook writer (fixtures and K2-sized report
    exports). Strings go through a shared-strings table; numbers are
    stored as numeric cells."""
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def cell_xml(r: int, c: int, v) -> str:
        ref = ""
        ci = c
        while True:
            ref = chr(ord("A") + ci % 26) + ref
            ci = ci // 26 - 1
            if ci < 0:
                break
        ref = f"{ref}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            # SpreadsheetML numeric cells cannot hold NaN/Infinity;
            # store non-finite values as shared strings instead
            if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
                v = str(v)
            else:
                return f'<c r="{ref}"><v>{v}</v></c>'
        s = str(v)
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return f'<c r="{ref}" t="s"><v>{shared_idx[s]}</v></c>'

    body = "".join(
        f'<row r="{ri + 1}">' + "".join(cell_xml(ri, ci, v) for ci, v in enumerate(row)) + "</row>"
        for ri, row in enumerate(rows)
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in shared)
        + "</sst>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" '
        'Target="sharedStrings.xml"/></Relationships>'
    )
    root_rels = (
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
        '<Override PartName="/xl/sharedStrings.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
        z.writestr("xl/sharedStrings.xml", sst)
