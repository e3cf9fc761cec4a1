"""Excel exploration sink (sources/excel.py) and in-memory record source
(sources/memory.py) — the reference's two remaining I/O surfaces
(helper.py to_excel exports; in-process dict fixtures)."""

from __future__ import annotations

import datetime as dt
import os
import zipfile
import xml.etree.ElementTree as ET

import pytest

from deduplication_challenge_spark.sources.excel import write_excel
from deduplication_challenge_spark.sources.memory import pages_from_records

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _read_sheet(path):
    """Parse sheet1 back into a list of rows of (ref, type, text)."""
    with zipfile.ZipFile(path) as zf:
        for part in (
            "[Content_Types].xml", "_rels/.rels",
            "xl/workbook.xml", "xl/_rels/workbook.xml.rels",
        ):
            ET.fromstring(zf.read(part))  # every part is well-formed XML
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    rows = []
    for row in sheet.iter("{%s}row" % _NS["m"]):
        cells = []
        for c in row.iter("{%s}c" % _NS["m"]):
            t = c.get("t", "n")
            if t == "inlineStr":
                text = c.find("m:is/m:t", _NS).text or ""
            else:
                v = c.find("m:v", _NS)
                text = v.text if v is not None else None
            cells.append((c.get("r"), t, text))
        rows.append(cells)
    return rows


class TestExcelSink:
    def test_roundtrip_types(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 2.5, True, "hé <&> llo", None),
             (2, -0.125, False, "plain", "x")],
            "id long, score double, flag boolean, name string, opt string",
        )
        path = str(tmp_path / "out.xlsx")
        assert write_excel(df, path) == 2
        rows = _read_sheet(path)
        assert [c[2] for c in rows[0]] == ["id", "score", "flag", "name", "opt"]
        r1 = rows[1]
        assert r1[0] == ("A2", "n", "1")
        assert r1[1] == ("B2", "n", "2.5")
        assert r1[2] == ("C2", "b", "1")
        assert r1[3] == ("D2", "inlineStr", "hé <&> llo")  # escaped + recovered
        assert len(r1) == 4  # None -> blank cell omitted entirely

    def test_refuses_oversize_never_truncates(self, spark, tmp_path):
        df = spark.range(10)
        path = str(tmp_path / "big.xlsx")
        with pytest.raises(ValueError, match="max_rows"):
            write_excel(df, path, max_rows=5)
        assert not os.path.exists(path)  # refused BEFORE writing anything

    def test_column_letters_past_z(self, spark, tmp_path):
        cols = [f"c{i} int" for i in range(30)]
        df = spark.createDataFrame([tuple(range(30))], ", ".join(cols))
        path = str(tmp_path / "wide.xlsx")
        write_excel(df, path)
        refs = [c[0] for c in _read_sheet(path)[1]]
        assert refs[25] == "Z2" and refs[26] == "AA2" and refs[29] == "AD2"

    def test_sheet_name_quoting_and_truncation(self, spark, tmp_path):
        """A '\"' in the sheet name must not break the name attribute, and
        the 31-char Excel limit truncates the RAW name — truncating the
        escaped form could cut an XML entity in half."""
        df = spark.createDataFrame([(1,)], "x int")
        p1 = str(tmp_path / "q.xlsx")
        write_excel(df, p1, sheet_name='Q3 "final" <&>')
        with zipfile.ZipFile(p1) as zf:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
        (sheet,) = wb.iter("{%s}sheet" % _NS["m"])
        assert sheet.get("name") == 'Q3 "final" <&>'
        p2 = str(tmp_path / "t.xlsx")
        write_excel(df, p2, sheet_name="A" * 29 + "&x")  # entity would be cut
        with zipfile.ZipFile(p2) as zf:
            wb = ET.fromstring(zf.read("xl/workbook.xml"))
        (sheet,) = wb.iter("{%s}sheet" % _NS["m"])
        assert sheet.get("name") == "A" * 29 + "&x"[:2]

    def test_64bit_ids_survive_as_strings(self, spark, tmp_path):
        """Ints at/past 2^53 (xxhash64 doc_ids) become inline strings —
        Excel parses numeric cells as doubles and would round them."""
        big = -6744616258214337103
        df = spark.createDataFrame([(big, 7)], "doc_id long, small long")
        path = str(tmp_path / "ids.xlsx")
        write_excel(df, path)
        r = _read_sheet(path)[1]
        assert r[0] == ("A2", "inlineStr", str(big))  # exact, typed string
        assert r[1] == ("B2", "n", "7")  # small ints stay numeric

    def test_timestamps_and_control_chars(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(dt.datetime(2025, 1, 2, 3, 4, 5), "bad\x01ctl")],
            "ts timestamp, s string",
        )
        path = str(tmp_path / "ts.xlsx")
        write_excel(df, path)
        r = _read_sheet(path)[1]
        assert r[0][2] == "2025-01-02 03:04:05"
        assert r[1][2] == "badctl"  # illegal XML control char stripped


class TestMemorySource:
    def test_records_become_distributed_pages(self, spark):
        df = pages_from_records(
            spark,
            [
                {"url": "https://a.example/1", "warc_ts": "2025-01-01T00:00:00",
                 "html": "<p>hi</p>", "text": "hi", "lang": "en"},
                {"url": "https://a.example/2"},  # optionals all null
            ],
        )
        assert df.schema.simpleString() == (
            "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
        )
        rows = {r["url"]: r for r in df.collect()}
        assert rows["https://a.example/1"]["html"] == bytearray(b"<p>hi</p>")
        assert rows["https://a.example/2"]["text"] is None

    def test_empty_list_yields_valid_empty_frame(self, spark):
        df = pages_from_records(spark, [])
        assert df.count() == 0 and len(df.schema) == 5

    def test_unknown_and_missing_keys_fail_loudly(self, spark):
        with pytest.raises(ValueError, match="unknown keys.*'ur1'"):
            pages_from_records(spark, [{"ur1": "typo"}])
        with pytest.raises(ValueError, match="missing required.*'url'"):
            pages_from_records(spark, [{"text": "no url"}])

    def test_null_url_fails_loudly(self, spark):
        """url is the identity column (doc_id = xxhash64(url)): an explicit
        None url must refuse, not silently collide records into one id."""
        with pytest.raises(ValueError, match="null/empty url"):
            pages_from_records(spark, [{"url": None, "text": "a"}])
        with pytest.raises(ValueError, match="null/empty url"):
            pages_from_records(spark, [{"url": "", "text": "b"}])

    def test_feeds_the_pipeline_directly(self, spark, tmp_path):
        """The frame is a first-class pages input: extraction runs on it
        exactly as on a parquet/WARC-sourced frame."""
        from deduplication_challenge_spark.operators.ingest import extract_pages

        df = pages_from_records(
            spark,
            [{"url": f"https://m.example/{i}",
              "warc_ts": "2025-01-01T00:00:00",
              "html": f"<html><body><p>doc {i} body</p></body></html>"}
             for i in range(4)],
        )
        out = extract_pages(df)
        assert out.count() == 4
        assert out.where(out.text.contains("doc 2 body")).count() == 1
