"""Hermetic numeric-xlsx reader/writer on the stdlib (zipfile + ElementTree).

The reference loads KIN40K from ``kin40k.xlsx`` sheets trainx/trainy/testx/testy
(`kin40k-FULL-compare.py:197-200`). pandas needs an optional engine (openpyxl /
calamine) to parse xlsx, and this environment bundles none — so the xlsx branch
of :func:`gpscore.data.kin40k.load_kin40k` would be dead weight behind an
ImportError. An .xlsx file is a zip of small XML parts; for a workbook of plain
numeric sheets (exactly what kin40k.xlsx is) a complete reader is ~60 lines of
stdlib. This module supplies:

- :func:`read_sheets`: sheet name -> float32 2-D array for the requested
  sheets. Handles numeric cells (``<c r="B3"><v>1.5</v></c>``, with or without
  ``t="n"``), resolves shared-string cells against ``xl/sharedStrings.xml``
  when they parse as numbers, treats empty/missing cells as NaN, and raises a
  clear error on genuinely non-numeric content (convert such files to
  .npz/.csv instead).
- :func:`write_sheets`: the inverse, for tests and for users converting
  arrays into the reference's on-disk format. Numeric inline values only.

Used by ``load_kin40k`` as the fallback when pandas has no xlsx engine, and
as the oracle the xlsx tests round-trip through (tests/test_data.py).
"""

from __future__ import annotations

import re
import zipfile
from typing import Dict, Iterable, Optional
from xml.etree import ElementTree as ET

import numpy as np

_XMLDECL = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
_NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"
_CELLREF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(letters: str) -> int:
    """'A' -> 0, 'Z' -> 25, 'AA' -> 26, ... (base-26 bijective)."""
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_letters(idx: int) -> str:
    letters = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        letters = chr(ord("A") + rem) + letters
    return letters


def _sheet_targets(zf: zipfile.ZipFile) -> Dict[str, str]:
    """Sheet name -> archive path of its worksheet XML."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{{{_NS_PKGREL}}}Relationship")
    }
    out = {}
    for sheet in wb.iter(f"{{{_NS_MAIN}}}sheet"):
        rid = sheet.get(f"{{{_NS_REL}}}id")
        target = rid_to_target[rid]
        if target.startswith("/"):
            target = target.lstrip("/")
        elif not target.startswith("xl/"):
            target = "xl/" + target
        out[sheet.get("name")] = target
    return out


def _shared_strings(zf: zipfile.ZipFile):
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(raw)
    strings = []
    for si in root.iter(f"{{{_NS_MAIN}}}si"):
        strings.append("".join(t.text or "" for t in si.iter(f"{{{_NS_MAIN}}}t")))
    return strings

def _parse_sheet(raw: bytes, shared, path: str) -> np.ndarray:
    cells = []  # (row, col, value)
    n_rows = n_cols = 0
    root = ET.fromstring(raw)
    row_idx = 0
    for row in root.iter(f"{{{_NS_MAIN}}}row"):
        row_idx = int(row.get("r", row_idx + 1))
        col_idx = 0
        for c in row.iter(f"{{{_NS_MAIN}}}c"):
            ref = c.get("r")
            if ref:
                m = _CELLREF.fullmatch(ref)
                col_idx = _col_index(m.group(1)) + 1
            else:
                col_idx += 1
            v = c.find(f"{{{_NS_MAIN}}}v")
            if v is None or v.text is None:
                continue
            t = c.get("t", "n")
            text = v.text
            if t == "s":
                text = shared[int(text)]
            elif t not in ("n", "str"):
                raise ValueError(
                    f"{path}: unsupported cell type {t!r} at {ref}; "
                    "convert the workbook to .npz/.csv"
                )
            try:
                val = float(text)
            except ValueError as e:
                raise ValueError(
                    f"{path}: non-numeric cell {ref} ({text!r}); "
                    "convert the workbook to .npz/.csv"
                ) from e
            cells.append((row_idx - 1, col_idx - 1, val))
            n_rows = max(n_rows, row_idx)
            n_cols = max(n_cols, col_idx)
    out = np.full((n_rows, n_cols), np.nan, np.float32)
    for r, c, val in cells:
        out[r, c] = val
    return out


def read_sheets(
    path: str, names: Optional[Iterable[str]] = None
) -> Dict[str, np.ndarray]:
    """Read numeric worksheets as float32 arrays (module docstring semantics:
    every row a data row, like ``pd.read_excel(..., header=None)``)."""
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if names is None:
            names = list(targets)
        missing = [n for n in names if n not in targets]
        if missing:
            raise KeyError(
                f"{path}: missing sheets {missing}; has {sorted(targets)}"
            )
        shared = _shared_strings(zf)
        return {
            name: _parse_sheet(zf.read(targets[name]), shared, targets[name])
            for name in names
        }


def write_sheets(path: str, sheets: Dict[str, np.ndarray]) -> None:
    """Write 1-D/2-D numeric arrays as one workbook (inverse of
    :func:`read_sheets`; NaNs become empty cells)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        names = list(sheets)
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "[Content_Types].xml",
            _XMLDECL
            + '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml\"/>"
            f"{overrides}</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            _XMLDECL + f'<Relationships xmlns="{_NS_PKGREL}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_tags = "".join(
            f'<sheet name="{name}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, name in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            _XMLDECL + f'<workbook xmlns="{_NS_MAIN}" xmlns:r="{_NS_REL}">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rel_tags = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet\" "
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            _XMLDECL
            + f'<Relationships xmlns="{_NS_PKGREL}">{rel_tags}</Relationships>',
        )
        for i, name in enumerate(names):
            arr = np.atleast_2d(np.asarray(sheets[name], np.float64))
            if arr.ndim != 2:
                raise ValueError(f"sheet {name!r}: need 1-D/2-D, got {arr.ndim}-D")
            rows = []
            for r in range(arr.shape[0]):
                cs = "".join(
                    f'<c r="{_col_letters(c)}{r + 1}">'
                    f"<v>{float(arr[r, c])!r}</v></c>"
                    for c in range(arr.shape[1])
                    if not np.isnan(arr[r, c])
                )
                rows.append(f'<row r="{r + 1}">{cs}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _XMLDECL + f'<worksheet xmlns="{_NS_MAIN}">'
                f"<sheetData>{''.join(rows)}</sheetData></worksheet>",
            )
