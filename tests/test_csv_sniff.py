"""CSV dialect sniffing + distributed parse (danae_spark/sources/csv_sniff.py)."""

from __future__ import annotations

import gzip

import pytest

from danae_spark.sources import csv_sniff


@pytest.fixture(scope="module")
def csv_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("csvs")
    comma = d / "comma.csv"
    comma.write_text("id,name,score\n1,alpha,0.5\n2,beta,1.5\n3,gamma,2.5\n")
    semi = d / "semi.csv"
    semi.write_text("id;name;score\n1;alpha;0,5\n2;beta;1,5\n")
    gz = d / "tabbed.csv.gz"
    with gzip.open(gz, "wt") as f:
        f.write("id\tname\n1\talpha\n2\tbeta\n")
    html = d / "page.csv"
    html.write_text("<!DOCTYPE html><html></html>\n")
    return {"comma": comma, "semi": semi, "gz": gz, "html": html}


def test_sniff_comma(csv_files):
    p = csv_sniff.sniff(str(csv_files["comma"]))
    assert p["separator"] == ","
    assert p["num_columns"] == 3
    assert p["is_csv_readable"]
    assert p["encoding"] == "UTF-8"


def test_sniff_semicolon(csv_files):
    p = csv_sniff.sniff(str(csv_files["semi"]))
    assert p["separator"] == ";"
    assert p["num_columns"] == 3


def test_sniff_gzip_tab(csv_files):
    p = csv_sniff.sniff(str(csv_files["gz"]))
    assert p["separator"] == "\t"
    assert p["compressed"]


def test_html_rejected(csv_files):
    p = csv_sniff.sniff(str(csv_files["html"]))
    assert not p["is_csv_readable"]


def test_distributed_read(spark, csv_files):
    df = csv_sniff.read_csv_sniffed(spark, str(csv_files["comma"]))
    assert df.columns == ["id", "name", "score"]
    assert df.count() == 3
    assert df.agg({"score": "sum"}).collect()[0][0] == pytest.approx(4.5)


def test_unreadable_raises(spark, csv_files):
    with pytest.raises(ValueError):
        csv_sniff.read_csv_sniffed(spark, str(csv_files["html"]))
