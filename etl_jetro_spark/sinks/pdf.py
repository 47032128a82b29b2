"""PDF merge sink (SURVEY §2.9 K6).

The reference merges per-PO PDFs into ``"{n} orders {MM-DD-YY}.pdf"``
(247/tools/combine_pdf_tool.py:7-62). No PDF library ships in this
container, so the merge is import-gated; the file-list plumbing (sorted
inputs, counted filename) is real and tested.
"""

from __future__ import annotations

import os
from datetime import date

try:  # pragma: no cover
    from pypdf import PdfWriter

    HAVE_PDF = True
except ImportError:
    try:  # pragma: no cover
        from PyPDF2 import PdfMerger as PdfWriter  # type: ignore

        HAVE_PDF = True
    except ImportError:
        HAVE_PDF = False


def merged_name(n_files: int, run_date: date) -> str:
    return f"{n_files} orders {run_date.strftime('%m-%d-%y')}.pdf"


def combine_pdfs(folder: str, out_dir: str, run_date: date) -> str:
    """Merge all .pdf files in ``folder`` (sorted) into the counted output
    name. Raises NotImplementedError without a PDF library."""
    files = sorted(
        os.path.join(folder, f)
        for f in os.listdir(folder)
        if f.lower().endswith(".pdf")
    )
    out_path = os.path.join(out_dir, merged_name(len(files), run_date))
    if not HAVE_PDF:
        raise NotImplementedError(
            f"pdf merge requires pypdf/PyPDF2; would write {out_path!r} "
            f"from {len(files)} inputs"
        )
    merger = PdfWriter()  # pragma: no cover
    for f in files:  # pragma: no cover
        merger.append(f)
    with open(out_path, "wb") as fh:  # pragma: no cover
        merger.write(fh)
    return out_path  # pragma: no cover
