"""E2E golden for the product-path runner (tools/run_product_pipeline.py):
parquet in -> consolidate_products -> parquet out, replaying the structure of
the reference's 4-product sample corpus
(/root/reference/src/tests/constants.py:10-197: ids 5554 / 7652 / 9971 /
10275; the CAS: 137-26-8 group = {9971, 10275} merges, 5554 is a singleton,
7652 has an invalid identifier).  Expected values mirror the reference's
integration tests (/root/reference/src/tests/test_integration.py:95-160) and
unit-test formatting ("60000.0", not "6.0E4").  Long free-text fields are
short stand-ins with the reference's length ordering preserved (elections
depend only on length/frequency, not content)."""

import json

import pytest

from deduplication_challenge_spark.sources.products import PRODUCTS_SCHEMA

URL_5554 = "https://www.harebueng.co.za/antioxidant-dbha-rubber-in-brazil.html"
URL_7652 = "https://www.harebueng.co.za/rubber-accelerator-tmq-suppliers.html"
URL_9971 = "https://www.harebueng.co.za/antiscorching-pvi-suppliers-poland.html"
URL_10275 = "https://advancedpressuresystems.ca/1"

DESC_9971 = "TMTD is a highly effective accelerator for rubber processing."
DESC_10275 = (
    "Rubber Accelerator TMTD IPPD is a highly effective ultra-accelerator "
    "widely used in rubber processing, particularly in low-temperature cures."
)
SUMMARY_9971 = (
    "TMTD (Tetramethylthiuram Disulfide) is a highly effective accelerator "
    "used primarily in rubber processing, particularly for low-temperature "
    "cures, and widely applicable as a fungicide in agriculture."
)
SUMMARY_10275 = "Rubber Accelerator TMTD IPPD, a TMTD ultra-accelerator."


def _row(**kw):
    base = {f.name: None for f in PRODUCTS_SCHEMA.fields}
    base.update(kw)
    return tuple(base[f.name] for f in PRODUCTS_SCHEMA.fields)


CORPUS = [
    _row(
        id=5554, unspsc="Pipe connectors", root_domain="studio-atcoat.com",
        page_url=URL_5554, product_title="Rubber Accelerator MBT",
        product_summary="Rubber Accelerator MBT is a high-quality rubber accelerator.",
        product_name="Rubber Accelerator", product_identifier="CAS: 149-30-4",
        brand="DeRoyal", description="Rubber Accelerator with CAS number 149-30-4.",
        intended_industries=["Manufacturing"], applicability=["Rubber Acceleration"],
        manufacturing_year=-1,
        production_capacity=[{"quantity": 1500, "time_frame": "Month", "type": "exact", "unit": "Tons"}],
        size=[{"dimension": "Weight", "qualitative": False, "type": "exact", "unit": "kg", "value": "1000"}],
        miscellaneous_features=["Mercaptobenzothiazole"],
    ),
    _row(
        id=7652, unspsc="Curing agents", root_domain="harebueng.co.za",
        page_url=URL_7652, product_title="Rubber Accelerator TMQ",
        product_summary="Rubber Accelerator TMQ enhances rubber vulcanization.",
        product_name="Rubber Accelerator TMQ", product_identifier="",
        brand="Nutrena", description="Rubber Accelerator TMQ for vulcanization.",
        intended_industries=["Rubber Industry"], applicability=["Rubber Vulcanization"],
        manufacturing_year=-1,
        customization=["Available in various forms"], form=["Powder", "Powder"],
    ),
    _row(
        id=9971, unspsc="Faucets or taps", root_domain="harebueng.co.za",
        page_url=URL_9971, product_title="Rubber Accelerator TMQ",
        product_summary=SUMMARY_9971, product_name="TMTD",
        product_identifier="CAS: 137-26-8", brand=None, description=DESC_9971,
        intended_industries=["Rubber Processing", "Agriculture"],
        applicability=["Rubber Processing", "Fungicide", "Seed Soaking"],
        eco_friendly=True,
        ethical_and_sustainability_practices=[
            "adhering to environmental standards and regulations",
            "designed to be recyclable",
        ],
        production_capacity=[
            {"quantity": 60, "time_frame": "Year", "type": "min", "unit": "Tons"},
            {"quantity": 70, "time_frame": "Year", "type": "max", "unit": "Tons"},
        ],
        price=[
            {"amount": 1.809999942779541, "currency": "USD", "type": "min"},
            {"amount": 1.899999976158142, "currency": "USD", "type": "max"},
        ],
        materials=["Ceramic"], ingredients=["Vanilla", "Salt"],
        manufacturing_year=-1, manufacturing_type=["Turnkey"],
        customization=["Various types of grinding wheels available"],
        form=["Powder"],
        size=[
            {"dimension": "Diameter", "qualitative": False, "type": "min", "unit": "mm", "value": "115"},
            {"dimension": "Diameter", "qualitative": False, "type": "max", "unit": "mm", "value": "450"},
        ],
        color=[{"original": "Blue", "simple": "White"}],
        purity=[{"qualitative": False, "type": "exact", "unit": None, "value": "96.0"}],
        power_rating=[
            {"qualitative": False, "type": "exact", "unit": "W", "value": "1200.0"},
            {"qualitative": True, "type": "exact", "unit": None, "value": "high"},
        ],
        quality_standards_and_certifications=["ISO Certified"],
        miscellaneous_features=["Initial Melting Point: At least 142.0C"],
    ),
    _row(
        id=10275, unspsc="Curing agents", root_domain="advancedpressuresystems.ca",
        page_url=URL_10275, product_title="Rubber Accelerator TMTD IPPD",
        product_summary=SUMMARY_10275, product_name="Rubber Accelerator",
        product_identifier="CAS: 137-26-8", brand="Nutrena", description=DESC_10275,
        intended_industries=["Rubber Industry"], applicability=["Rubber Processing"],
        ethical_and_sustainability_practices=[
            "meet the E1 formaldehyde standards",
            "designed to be recyclable",
        ],
        production_capacity=[
            {"quantity": 60000, "time_frame": "Month", "type": "exact", "unit": "Units"}
        ],
        materials=["Ceramic", "Ceramic powder"], ingredients=["Vanilla", "Spiced"],
        manufacturing_countries=["PK"], manufacturing_year=-1,
        customization=["Various colors available"], packaging_type=["Cartons"],
        form=["Powder", "Granules"],
        size=[
            {"dimension": "Length", "qualitative": False, "type": "exact", "unit": "mm", "value": "127"},
            {"dimension": "Width", "qualitative": False, "type": "exact", "unit": "mm", "value": "82"},
        ],
        color=[{"original": "Blue", "simple": "Blue"}],
        purity=[
            {"qualitative": False, "type": "exact", "unit": None, "value": "97.0"},
            {"qualitative": True, "type": "exact", "unit": None, "value": "high"},
        ],
        pressure_rating=[{"qualitative": True, "type": "exact", "unit": None, "value": "high"}],
        quality_standards_and_certifications=["HG/T 2334-2007"],
        miscellaneous_features=["Insoluble in water"],
    ),
]


@pytest.fixture(scope="module")
def output(spark, tmp_path_factory):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from run_product_pipeline import run

    base = tmp_path_factory.mktemp("product_e2e")
    inp, outp = str(base / "in.parquet"), str(base / "out.parquet")
    spark.createDataFrame(CORPUS, PRODUCTS_SCHEMA).write.parquet(inp)
    stats = run(spark, inp, outp)
    rows = {r["id"]: r for r in spark.read.parquet(outp).collect()}
    return stats, rows


def test_cardinality(output):
    stats, rows = output
    assert stats["input_rows"] == 4
    # the CAS: 137-26-8 pair merges into one record -> 3 rows like the
    # reference's test_convert_dict_back_to_parquet
    assert stats["output_rows"] == 3
    assert set(rows) == {5554, 7652, 9971}


def test_elections(output):
    _, rows = output
    m = rows[9971]
    assert m["unspsc"] == "Curing agents"
    assert m["root_domain"] == "harebueng.co.za"
    assert m["brand"] == "Nutrena"
    assert m["product_name"] == "TMTD"
    assert m["product_title"] == "Rubber Accelerator TMTD IPPD"
    assert m["description"] == DESC_10275   # lengthiest
    assert m["product_summary"] == SUMMARY_9971
    assert m["page_url"] == URL_9971        # first url containing root_domain


def test_intervals(output):
    _, rows = output
    m = rows[9971]
    caps = {(c["time_frame"], c["unit"]): (c["min"], c["max"]) for c in m["production_capacity"]}
    assert caps == {("Year", "Tons"): ("60.0", "70.0"),
                    ("Month", "Units"): ("60000.0", "60000.0")}
    price = {p["currency"]: (p["min"], p["max"]) for p in m["price"]}
    assert price == {"USD": ("1.809999942779541", "1.899999976158142")}
    purity = {(p["qualitative"], p["unit"]): (p["min"], p["max"]) for p in m["purity"]}
    assert purity == {(False, None): ("96.0", "97.0"), (True, None): ("high", "high")}
    power = {(p["qualitative"], p["unit"]): (p["min"], p["max"]) for p in m["power_rating"]}
    assert power == {(False, "W"): ("1200.0", "1200.0"), (True, None): ("high", "high")}
    pressure = {(p["qualitative"], p["unit"]): (p["min"], p["max"]) for p in m["pressure_rating"]}
    assert pressure == {(True, None): ("high", "high")}
    size = {(s["dimension"], s["unit"]): (s["min"], s["max"]) for s in m["size"]}
    assert size == {("Diameter", "mm"): ("115.0", "450.0"),
                    ("Length", "mm"): ("127.0", "127.0"),
                    ("Width", "mm"): ("82.0", "82.0")}
    colors = {c["original"]: c["simple"] for c in m["color"]}
    assert colors == {"Blue": "Blue, White"}


def test_completing(output):
    _, rows = output
    m = rows[9971]
    assert m["intended_industries"] == ["Agriculture", "Rubber Industry", "Rubber Processing"]
    assert m["materials"] == ["Ceramic", "Ceramic powder"]
    assert m["ingredients"] == ["Salt", "Spiced", "Vanilla"]
    assert m["eco_friendly"] == [True]
    assert m["manufacturing_year"] == [-1]


def test_details(output):
    _, rows = output
    d = json.loads(rows[9971]["details"])
    # mirrors test_details_for_merge_by_least_frequent_were_modified_correctly
    assert d["product_title"] == {
        "Rubber Accelerator TMQ": [URL_9971],
        "Rubber Accelerator TMTD IPPD": [URL_10275],
    }
    assert d["product_name"] == {
        "TMTD": [URL_9971],
        "Rubber Accelerator": [URL_10275],
    }
    # mirrors test_details_for_merge_by_most_frequent_were_modified_correctly
    assert d["brand"] == {"Nutrena": [URL_10275]}
    assert d["unspsc"] == {
        "Faucets or taps": [URL_9971],
        "Curing agents": [URL_10275],
    }
    assert d["root_domain"] == {
        "harebueng.co.za": [URL_9971],
        "advancedpressuresystems.ca": [URL_10275],
    }
    # lengthiest-value fields never recorded
    assert "description" not in d and "product_summary" not in d


def test_passthrough_rows(output):
    _, rows = output
    assert rows[5554]["details"] == "{}"
    assert rows[7652]["details"] == "{}"
    assert rows[5554]["product_title"] == "Rubber Accelerator MBT"
    caps = [(c["time_frame"], c["unit"], c["min"], c["max"])
            for c in rows[5554]["production_capacity"]]
    assert caps == [("Month", "Tons", "1500.0", "1500.0")]
