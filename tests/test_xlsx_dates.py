"""Styled-date rendering in the stdlib xlsx reader (round-5 item #7):
cell-format probe (xl/styles.xml cellXfs -> numFmtId) + opt-in ISO
rendering, both epochs — what temporal exports need
(reference scripts/import_temporal_history.py reads change dates the
fixed-column loader would surface as raw serial floats)."""

from __future__ import annotations

import datetime

from kgforge import xlsx
from tests.util import write_xlsx


def _wb(tmp_path, **kw):
    return write_xlsx(str(tmp_path / "t.xlsx"), **kw)


def test_default_read_keeps_serial_floats(tmp_path):
    path = _wb(
        tmp_path,
        sheets={"S": [["Number", "When"], ["P1", ("n", 45123, 1)]]},
        num_fmts={1: 14},  # builtin m/d/yyyy
    )
    grid = xlsx.read_workbook(path)["S"]
    assert grid[1] == ["P1", 45123.0]  # opt-in only: no behavior change


def test_builtin_and_custom_date_styles_render_iso(tmp_path):
    path = _wb(
        tmp_path,
        sheets={
            "S": [
                ["Number", "Released", "Modified", "Qty", "Cost"],
                [
                    "P1",
                    ("n", 45123, 1),       # builtin 14 -> date
                    ("n", 45123.5, 2),     # custom datetime -> date+time
                    ("n", 7, 0),           # General -> stays float
                    ("n", 9.5, 3),         # quoted 'd' is NOT a date token
                ],
            ]
        },
        num_fmts={
            1: 14,
            2: (164, "yyyy-mm-dd hh:mm"),
            3: (165, '"days"0.00'),
        },
    )
    grid = xlsx.read_workbook(path, render_dates=True)["S"]
    # Excel serial 45123 under the 1900 epoch = 2023-07-16
    assert grid[1][1] == "2023-07-16"
    assert grid[1][2] == "2023-07-16 12:00:00"
    assert grid[1][3] == 7.0
    assert grid[1][4] == 9.5


def test_epoch_1900_phantom_leap_day():
    # serial 1 = 1900-01-01; 59 = 1900-02-28; the phantom 1900-02-29
    # (serial 60) collapses onto 02-28; 61 = 1900-03-01
    assert xlsx._serial_to_iso(1, False) == "1900-01-01"
    assert xlsx._serial_to_iso(59, False) == "1900-02-28"
    assert xlsx._serial_to_iso(60, False) == "1900-02-28"
    assert xlsx._serial_to_iso(61, False) == "1900-03-01"


def test_epoch_1904_workbook(tmp_path):
    path = _wb(
        tmp_path,
        sheets={"S": [["When"], [("n", 100.25, 1)]]},
        num_fmts={1: 22},  # builtin m/d/yy h:mm
        date1904=True,
    )
    grid = xlsx.read_workbook(path, render_dates=True)["S"]
    want = datetime.datetime(1904, 1, 1) + datetime.timedelta(days=100.25)
    assert grid[1][0] == want.isoformat(sep=" ")


def test_date_format_probe():
    assert xlsx._is_date_format("yyyy-mm-dd")
    assert xlsx._is_date_format("[$-409]d-mmm-yy")
    assert not xlsx._is_date_format("0.00%")
    assert not xlsx._is_date_format('"days remaining"0')
    assert not xlsx._is_date_format("#,##0.00")
    assert not xlsx._is_date_format("General")
    # [h] elapsed-hours bracket is stripped; bare h outside survives
    assert xlsx._is_date_format("h:mm:ss")


def test_change_scan_renders_styled_revision_dates(tmp_path, spark):
    """read_excel_changes(render_dates=True): a temporal export whose
    Revision column is date-styled comes out ISO (parseable by the P13
    date parse) instead of a serial-float string."""
    from kgforge import sources

    rows = [
        ["Number", "Name", "Revision", "State"],
        ["P1", "WIDGET", ("n", 45123, 1), "RELEASED"],
        ["P2", "GADGET", ("n", 45124, 1), "DESIGN"],
    ]
    path = _wb(tmp_path, sheets={"ChangeInfo-Sheet": rows}, num_fmts={1: 14})
    iso = sources.read_excel_changes(spark, path, render_dates=True)
    got = {(r["part_number"], r["revision"]) for r in iso.collect()}
    assert got == {("P1", "2023-07-16"), ("P2", "2023-07-17")}
    raw = sources.read_excel_changes(spark, path)
    raw_revs = {r["revision"] for r in raw.collect()}
    assert raw_revs.isdisjoint({"2023-07-16", "2023-07-17"})
