"""Named per-corpus connector tests: tiny fixture files in each corpus's
RAW format (the conventions in Data_manager/<corpus>/ readers), parsed by
sources/corpus_readers and checked for exact URM triples + ID mappers."""

from __future__ import annotations

import pytest

from contentwise_impressions_spark.sources import corpus_readers as cr


def _triples(urm, user_map, item_map):
    """(user_token, item_token, value) — undo the mappers for readable
    assertions."""
    u = {r["user_id"]: r["user_token"] for r in user_map.collect()}
    i = {r["item_id"]: r["item_token"] for r in item_map.collect()}
    return sorted(
        (u[r["user_id"]], i[r["item_id"]], r["value"]) for r in urm.collect()
    )


def test_movielens_100k(spark, tmp_path):
    p = tmp_path / "u.data"
    p.write_text("1\t10\t4.0\t100\n1\t10\t2.0\t200\n2\t20\t5.0\t50\n")
    out = _triples(*cr.read_movielens_100k(spark, str(p)))
    # keep-LAST by ts: (1,10) survives with rating 2.0
    assert out == [("1", "10", 2.0), ("2", "20", 5.0)]


def test_movielens_1m_and_10m(spark, tmp_path):
    p = tmp_path / "ratings.dat"
    p.write_text("1::10::4::100\n2::10::3::50\n")
    out = _triples(*cr.read_movielens_1m(spark, str(p)))
    assert out == [("1", "10", 4.0), ("2", "10", 3.0)]
    assert _triples(*cr.read_movielens_10m(spark, str(p))) == out


def test_movielens_20m(spark, tmp_path):
    p = tmp_path / "ratings.csv"
    p.write_text("userId,movieId,rating,timestamp\n7,99,3.5,1111\n8,99,5.0,2222\n")
    out = _triples(*cr.read_movielens_20m(spark, str(p)))
    assert out == [("7", "99", 3.5), ("8", "99", 5.0)]


def test_movielens_hetrec2011(spark, tmp_path):
    p = tmp_path / "user_ratedmovies.dat"
    p.write_text(
        "userID\tmovieID\trating\tdate_day\n75\t3\t1.0\t29\n75\t32\t4.5\t29\n"
    )
    out = _triples(*cr.read_movielens_hetrec2011(spark, str(p)))
    assert out == [("75", "3", 1.0), ("75", "32", 4.5)]


def test_movielens_genres_icm(spark, tmp_path):
    p = tmp_path / "movies.csv"
    p.write_text(
        'movieId,title,genres\n1,"Toy Story (1995)",Animation|Comedy\n'
        "2,Boring,(no genres listed)\n"
    )
    rows = sorted(
        (r["item_token"], r["feature"])
        for r in cr.movielens_genres_icm(spark, str(p), sep=",", header=True).collect()
    )
    assert rows == [("1", "Animation"), ("1", "Comedy")]


def test_movielens_tags_icm_porter(spark, tmp_path):
    p = tmp_path / "tags.csv"
    p.write_text(
        "userId,movieId,tag,timestamp\n1,5,Running Fast!,100\n2,5,runs,200\n"
    )
    rows = sorted(
        (r["item_token"], r["feature"])
        for r in cr.movielens_tags_icm(spark, str(p)).collect()
    )
    # Porter: running→run, fast→fast, runs→run (dedup per item)
    assert rows == [("5", "fast"), ("5", "run")]


def test_netflix_prize_multifile(spark, tmp_path):
    (tmp_path / "combined_data_1.txt").write_text(
        "1:\n11,3,2005-09-06\n12,5,2005-09-07\n2:\n11,4,2005-01-02\n"
    )
    (tmp_path / "combined_data_2.txt").write_text("3:\n13,1,2004-02-01\n")
    out = _triples(
        *cr.read_netflix_prize(spark, str(tmp_path / "combined_data_*.txt"))
    )
    assert out == [
        ("11", "1", 3.0),
        ("11", "2", 4.0),
        ("12", "1", 5.0),
        ("13", "3", 1.0),
    ]


def test_amazon_ratings_and_metadata(spark, tmp_path):
    p = tmp_path / "ratings_Digital_Music.csv"
    p.write_text("A1,B001,5.0,1111\nA2,B001,1.0,2222\n")
    out = _triples(*cr.read_amazon_music(spark, str(p)))
    assert out == [("A1", "B001", 5.0), ("A2", "B001", 1.0)]
    assert _triples(*cr.read_amazon_movies_tv(spark, str(p))) == out

    m = tmp_path / "meta.json"
    m.write_text(
        '{"asin": "B001", "categories": [["CDs", "Pop"]]}\n'
        '{"asin": "B002", "categories": [["CDs"]]}\n'
    )
    rows = sorted(
        (r["item_token"], r["feature"])
        for r in cr.amazon_metadata_icm(spark, str(m)).collect()
    )
    assert rows == [("B001", "CDs"), ("B001", "Pop"), ("B002", "CDs")]


def test_epinions(spark, tmp_path):
    p = tmp_path / "ratings_data.txt"
    p.write_text("u i r\n1 100 5\n2 100 3\n")
    out = _triples(*cr.read_epinions(spark, str(p)))
    assert out == [("1", "100", 5.0), ("2", "100", 3.0)]


def test_filmtrust(spark, tmp_path):
    p = tmp_path / "ratings.txt"
    p.write_text("1 1 2.5\n1 2 4.0\n")
    out = _triples(*cr.read_filmtrust(spark, str(p)))
    assert out == [("1", "1", 2.5), ("1", "2", 4.0)]


def test_gowalla_implicit_dedup(spark, tmp_path):
    p = tmp_path / "loc-gowalla_totalCheckins.txt"
    p.write_text(
        "0\t2010-10-19T23:55:27Z\t30.2\t-97.7\t22847\n"
        "0\t2010-10-18T22:17:43Z\t30.2\t-97.7\t22847\n"
        "1\t2010-10-17T23:42:03Z\t40.6\t-73.9\t23261\n"
    )
    out = _triples(*cr.read_gowalla(spark, str(p)))
    # repeated check-ins collapse to a single implicit 1.0
    assert out == [("0", "22847", 1.0), ("1", "23261", 1.0)]


def test_frappe_libfm_merge(spark, tmp_path):
    (tmp_path / "frappe.train.libfm").write_text("1 0:1 957:1\n3 5:1 957:1\n")
    (tmp_path / "frappe.test.libfm").write_text("2 0:1 958:1\n")
    out = _triples(*cr.read_frappe(spark, str(tmp_path / "frappe.*.libfm")))
    assert out == [("0", "957", 1.0), ("0", "958", 1.0), ("5", "957", 1.0)]


def test_icm_with_mapped_ids(spark, tmp_path):
    p = tmp_path / "ratings.csv"
    p.write_text("userId,movieId,rating,timestamp\n7,1,3.5,1\n8,2,5.0,2\n")
    urm, user_map, item_map = cr.read_movielens_20m(spark, str(p))
    m = tmp_path / "movies.csv"
    # item 3 is not in the URM → dropped (if_new_item='ignore')
    m.write_text("movieId,title,genres\n1,A,X|Y\n3,B,Z\n")
    icm_tok = cr.movielens_genres_icm(spark, str(m), sep=",", header=True)
    icm = cr.icm_with_mapped_ids(icm_tok, item_map)
    rows = sorted((r["item_id"], r["feature"]) for r in icm.collect())
    item_1 = {r["item_token"]: r["item_id"] for r in item_map.collect()}["1"]
    assert rows == [(item_1, "X"), (item_1, "Y")]
