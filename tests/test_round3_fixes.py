"""Round-3 ADVICE fixes: SVG escaping in the heatmap sink, xlsx sheet
ordering past 9 sheets, and --pred-patterns CLI validation."""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

import pytest


def test_heatmap_svg_escapes_labels():
    from bert_namedentityrecognition_spark.operators.triples import heatmap_svg

    svg = heatmap_svg(
        [
            {"subj": "A&B <drug>", "x<1>": 3, "y&z": 0},
            {"subj": 'C"D', "x<1>": 1, "y&z": 2},
        ]
    )
    # well-formed XML despite &, <, > in entity surfaces
    root = ET.fromstring(svg)
    texts = [t.text for t in root.iter("{http://www.w3.org/2000/svg}text")]
    assert "A&B <drug>" in texts and "x<1>" in texts
    titles = [t.text for t in root.iter("{http://www.w3.org/2000/svg}title")]
    assert any("A&B <drug> × x<1>: 3" == t for t in titles)


def _many_sheet_xlsx(path: str, with_rels: bool, n: int = 11) -> None:
    """n worksheets; sheet k holds header 'col' + one row 'v{k}'. The
    workbook declares them in REVERSE filename order so declared order and
    filename order disagree (the regression trap)."""
    main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    relns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"

    def sheet_xml(k):
        return (
            f'<worksheet xmlns="{main}"><sheetData>'
            f'<row r="1"><c r="A1" t="inlineStr"><is><t>col</t></is></c></row>'
            f'<row r="2"><c r="A2" t="inlineStr"><is><t>v{k}</t></is></c></row>'
            f"</sheetData></worksheet>"
        )

    order = list(range(n, 0, -1))  # declared: sheet{n}.xml first
    sheets = "".join(
        f'<sheet name="S{k}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, k in enumerate(order)
    )
    workbook = (
        f'<workbook xmlns="{main}" xmlns:r="{relns}"><sheets>{sheets}</sheets></workbook>'
    )
    rels = (
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="{relns}/worksheet" '
            f'Target="worksheets/sheet{k}.xml"/>'
            for i, k in enumerate(order)
        )
        + "</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", workbook)
        if with_rels:
            zf.writestr("xl/_rels/workbook.xml.rels", rels)
        for k in range(1, n + 1):
            zf.writestr(f"xl/worksheets/sheet{k}.xml", sheet_xml(k))


def test_xlsx_sheet_order_follows_workbook_declaration(tmp_path):
    from bert_namedentityrecognition_spark.sources.dims import read_xlsx_rows

    p = str(tmp_path / "many.xlsx")
    _many_sheet_xlsx(p, with_rels=True)
    # declared order is sheet11, sheet10, ..., sheet1
    assert read_xlsx_rows(p, sheet_index=0) == [{"col": "v11"}]
    assert read_xlsx_rows(p, sheet_index=1) == [{"col": "v10"}]
    assert read_xlsx_rows(p, sheet_index=10) == [{"col": "v1"}]


def test_xlsx_sheet_order_numeric_fallback(tmp_path):
    """No rels part → numeric-suffix sort (lexicographic would put
    sheet10.xml at index 1 instead of sheet2.xml)."""
    from bert_namedentityrecognition_spark.sources.dims import read_xlsx_rows

    p = str(tmp_path / "norels.xlsx")
    _many_sheet_xlsx(p, with_rels=False)
    assert read_xlsx_rows(p, sheet_index=1) == [{"col": "v2"}]
    assert read_xlsx_rows(p, sheet_index=9) == [{"col": "v10"}]


def test_pred_patterns_cli_validation(capsys):
    from scripts.run_pipeline import main

    # spec without '=' → clear argparse error, not an unpack ValueError
    with pytest.raises(SystemExit):
        main(["--pages-dir", "/x", "--out", "/y", "--pred-patterns", "no-equals-here"])
    err = capsys.readouterr().err
    assert "no '='" in err and "no-equals-here" in err
