"""Named per-corpus dataset connectors — the Data_manager/<corpus>/ layer.

One function per reader class the reference ships, each encoding that
corpus's RAW FILE conventions (separator, header, column roles, implicit
flattening, multi-file layouts) as a Spark-native parse; the download /
unzip step is out of scope (no network in the build environment — point
the reader at the extracted file(s)).

| reference class (Data_manager/...)            | connector here            |
|-----------------------------------------------|---------------------------|
| Movielens/Movielens100KReader.py              | read_movielens_100k       |
| Movielens/Movielens1MReader.py                | read_movielens_1m         |
| Movielens/Movielens10MReader.py               | read_movielens_10m        |
| Movielens/Movielens20MReader.py               | read_movielens_20m        |
| Movielens/MovielensHetrec2011Reader.py        | read_movielens_hetrec2011 |
| NetflixPrize/NetflixPrizeReader.py            | read_netflix_prize        |
| AmazonReviewData/AmazonMusicReader.py         | read_amazon_music         |
| AmazonReviewData/AmazonMoviesTVReader.py      | read_amazon_movies_tv     |
| Epinions/EpinionsReader.py                    | read_epinions             |
| FilmTrust/FilmTrustReader.py                  | read_filmtrust            |
| Frappe/FrappeReader.py                        | read_frappe               |
| Gowalla/GowallaReader.py                      | read_gowalla              |

Every connector returns `(urm, user_map, item_map)` via
:func:`.ratings_csv.ratings_to_urm` (the IncrementalSparseMatrix
auto-mapper analog); readers with item/user content additionally expose
ICM/UCM builders returning (item_id/user_id, feature, value) triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .ratings_csv import build_id_mapper, load_ratings_csv, ratings_to_urm

_URM = tuple[DataFrame, DataFrame, DataFrame]


def _urm_from_csv(spark, path, **kw) -> _URM:
    return ratings_to_urm(load_ratings_csv(spark, path, **kw))


# ---------------------------------------------------------------------------
# Movielens family
# ---------------------------------------------------------------------------
def read_movielens_100k(spark: SparkSession, u_data_path: str) -> _URM:
    """ml-100k `u.data`: tab-separated `user item rating ts`, no header
    (Movielens100KReader.py:46-48)."""
    return _urm_from_csv(
        spark, u_data_path, sep="\t", header=False,
        user_col=0, item_col=1, rating_col=2, ts_col=3,
    )


def read_movielens_1m(spark: SparkSession, ratings_dat_path: str) -> _URM:
    """ml-1m `ratings.dat`: `user::item::rating::ts`, no header
    (Movielens1MReader.py:61-63)."""
    return _urm_from_csv(
        spark, ratings_dat_path, sep="::", header=False,
        user_col=0, item_col=1, rating_col=2, ts_col=3,
    )


def read_movielens_10m(spark: SparkSession, ratings_dat_path: str) -> _URM:
    """ml-10M100K `ratings.dat`: same `::` convention as 1M
    (Movielens10MReader.py)."""
    return read_movielens_1m(spark, ratings_dat_path)


def read_movielens_20m(spark: SparkSession, ratings_csv_path: str) -> _URM:
    """ml-20m `ratings.csv`: comma-separated WITH header
    (Movielens20MReader.py:60-63)."""
    return _urm_from_csv(
        spark, ratings_csv_path, sep=",", header=True,
        user_col=0, item_col=1, rating_col=2, ts_col=3,
    )


def read_movielens_hetrec2011(
    spark: SparkSession, user_ratedmovies_path: str
) -> _URM:
    """hetrec2011 `user_ratedmovies.dat`: tab-separated WITH header,
    (userID, movieID, rating, ...) (MovielensHetrec2011Reader.py:49-55);
    no usable timestamp column → first-seen dedup."""
    return _urm_from_csv(
        spark, user_ratedmovies_path, sep="\t", header=True,
        user_col=0, item_col=1, rating_col=2, ts_col=None,
    )


def movielens_genres_icm(
    spark: SparkSession,
    movies_path: str,
    sep: str,
    header: bool,
) -> DataFrame:
    """(item_token, feature, value=1.0) from a Movielens movies file whose
    LAST column is `genre1|genre2|...` (_utils_movielens_parser
    _loadICM_genres: header/'::' for 1M, header/',' for 20M).  The 20M csv
    titles may contain commas, so the genre column is taken positionally
    from the end."""
    df = spark.read.csv(movies_path, sep=sep, header=header)
    cols = df.columns
    return (
        df.select(
            F.col(cols[0]).alias("item_token"),
            F.explode(F.split(F.col(cols[-1]), r"\|")).alias("feature"),
        )
        .filter(F.col("feature") != "")
        .filter(F.col("feature") != "(no genres listed)")
        .distinct()
        .withColumn("value", F.lit(1.0))
    )


def movielens_tags_icm(
    spark: SparkSession, tags_csv_path: str, stem: bool = True
) -> DataFrame:
    """(item_token, feature, value=1.0) from ml-20m `tags.csv` (header:
    userId,movieId,tag,timestamp) — _loadICM_tags + TagPreprocessing
    .tagFilterAndStemming: lowercase, strip non-alphanumeric, split,
    Porter-stem, unique per item.  Stemming runs over the DISTINCT tag
    vocabulary (pandas UDF) like plans/textops.q_tag_tokens_porter."""
    df = spark.read.csv(tags_csv_path, sep=",", header=True)
    cols = df.columns
    toks = (
        df.select(
            F.col(cols[1]).alias("item_token"),
            F.explode(
                F.split(
                    F.regexp_replace(F.lower(F.col(cols[2])), r"[^a-z0-9 ]", " "),
                    r"\s+",
                )
            ).alias("tag"),
        )
        .filter(F.col("tag") != "")
    )
    if stem:
        import pandas as pd  # noqa: F401

        from ..functions.porter import porter_stem

        @F.pandas_udf("string")
        def _stem(s):
            return s.map(porter_stem)

        vocab = toks.select("tag").distinct().withColumn("feature", _stem("tag"))
        toks = toks.join(F.broadcast(vocab), "tag")
    else:
        toks = toks.withColumn("feature", F.col("tag"))
    return (
        toks.select("item_token", "feature")
        .distinct()
        .withColumn("value", F.lit(1.0))
    )


# ---------------------------------------------------------------------------
# NetflixPrize: stateful multi-file format, solved relationally
# ---------------------------------------------------------------------------
def read_netflix_prize(spark: SparkSession, combined_data_glob: str) -> _URM:
    """`combined_data_{1..4}.txt`: a `<movie_id>:` header line, then
    `user,rating,date` rows belonging to that movie until the next header
    (NetflixPrizeReader.py:80-130 — a sequential driver loop there).

    Spark shape: the "current movie" carry-forward is a per-file
    last-non-null window over the line order — `last(movie_id,
    ignorenulls)` with rows-unbounded-preceding — i.e. a distributed
    fill-forward instead of a driver-side scan.  Line order within a file
    comes from `wholetext` + posexplode of the split lines: the index is
    the line number BY CONSTRUCTION, with no dependence on scan-partition
    ordering (monotonically_increasing_id over a split file is only
    file-offset-ordered under Spark's current size-desc split packing —
    an undocumented contract).  One row per file is the right granularity
    here: the format is inherently sequential per file, so per-file
    parallelism is the ceiling either way (4 files in the real corpus).
    """
    lines = (
        spark.read.text(combined_data_glob, wholetext=True)
        .withColumn("_file", F.input_file_name())
        .select(
            "_file",
            F.posexplode(F.split("value", "\r?\n")).alias("_lid", "value"),
        )
    )
    parsed = lines.select(
        "_file",
        "_lid",
        F.regexp_extract("value", r"^(\d+):\s*$", 1).alias("_hdr"),
        F.split("value", ",").alias("_parts"),
    )
    w = (
        Window.partitionBy("_file")
        .orderBy("_lid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_movie = parsed.withColumn(
        "item_token",
        F.last(F.when(F.col("_hdr") != "", F.col("_hdr")), ignorenulls=True).over(w),
    )
    ratings = (
        with_movie.filter((F.col("_hdr") == "") & (F.size("_parts") == 3))
        .select(
            F.col("_parts")[0].alias("user_token"),
            "item_token",
            F.col("_parts")[1].cast("double").alias("rating"),
            # date is yyyy-mm-dd; keep-last dedup orders on it
            F.unix_timestamp(
                F.to_date(F.col("_parts")[2], "yyyy-MM-dd")
            ).alias("ts"),
        )
    )
    from ..operators.dedup import keep_last_by_timestamp

    ratings = keep_last_by_timestamp(
        ratings, ["user_token", "item_token"], "ts", tiebreak=["rating"]
    )
    return ratings_to_urm(ratings)


# ---------------------------------------------------------------------------
# Amazon review data
# ---------------------------------------------------------------------------
def read_amazon_music(spark: SparkSession, ratings_csv_path: str) -> _URM:
    """`ratings_Digital_Music.csv`: `user,item,rating,ts`, no header
    (_AmazonReviewDataReader.py:114)."""
    return _urm_from_csv(
        spark, ratings_csv_path, sep=",", header=False,
        user_col=0, item_col=1, rating_col=2, ts_col=3,
    )


def read_amazon_movies_tv(spark: SparkSession, ratings_csv_path: str) -> _URM:
    """`ratings_Movies_and_TV.csv`: same convention
    (AmazonMoviesTVReader.py)."""
    return read_amazon_music(spark, ratings_csv_path)


def amazon_metadata_icm(spark: SparkSession, meta_json_path: str) -> DataFrame:
    """(item_token, feature, value=1.0) from the product-metadata JSON:
    one object per line with `asin` and nested `categories` lists
    (_AmazonReviewDataReader.py:188 + parse_json).  The reference
    eval()s loose JSON driver-side; here `spark.read.json` parses
    strict-JSON lines distributed (PERMISSIVE mode skips loose rows into
    _corrupt_record rather than failing the load)."""
    df = spark.read.json(meta_json_path)
    if "categories" not in df.columns:
        raise ValueError("metadata file has no 'categories' field")
    return (
        df.select(
            F.col("asin").alias("item_token"),
            F.explode(F.flatten("categories")).alias("feature"),
        )
        .filter(F.col("feature").isNotNull() & (F.col("feature") != ""))
        .distinct()
        .withColumn("value", F.lit(1.0))
    )


# ---------------------------------------------------------------------------
# single-file rating corpora
# ---------------------------------------------------------------------------
def read_epinions(spark: SparkSession, ratings_data_path: str) -> _URM:
    """`ratings_data.txt`: space-separated `user item rating`, one header
    line to skip, no timestamp (EpinionsReader.py:71)."""
    return _urm_from_csv(
        spark, ratings_data_path, sep=" ", header=True,
        user_col=0, item_col=1, rating_col=2, ts_col=None,
    )


def read_filmtrust(spark: SparkSession, ratings_txt_path: str) -> _URM:
    """`ratings.txt`: space-separated `user item rating`, no header, no
    timestamp; duplicates keep-first (FilmTrustReader.py:56-59)."""
    return _urm_from_csv(
        spark, ratings_txt_path, sep=" ", header=False,
        user_col=0, item_col=1, rating_col=2, ts_col=None,
    )


def read_gowalla(spark: SparkSession, checkins_path: str) -> _URM:
    """`loc-gowalla_totalCheckins.txt`: tab-separated `user ts lat lon
    location`, IMPLICIT — repeated check-ins collapse to value 1.0
    (GowallaReader.py:66-75 sets URM.data to ones)."""
    df = spark.read.csv(checkins_path, sep="\t", header=False)
    cols = df.columns
    ratings = (
        df.select(
            F.col(cols[0]).alias("user_token"),
            F.col(cols[4]).alias("item_token"),
        )
        .distinct()
        .withColumn("rating", F.lit(1.0))
        .withColumn("ts", F.lit(0).cast("bigint"))
    )
    return ratings_to_urm(ratings)


def read_frappe(spark: SparkSession, libfm_glob: str) -> _URM:
    """`frappe.{train,test,validation}.libfm`: libFM rows
    `label user_idx:1 item_idx:1 ...`; field 1 is the user index, field 2
    the item index, interactions IMPLICIT ones; the three splits merge
    into URM_all (FrappeReader.py:64-91,120-158)."""
    lines = spark.read.text(libfm_glob)
    parts = lines.select(F.split("value", " ").alias("p")).filter(
        F.size("p") >= 3
    )
    ratings = (
        parts.select(
            F.split(F.col("p")[1], ":")[0].alias("user_token"),
            F.split(F.col("p")[2], ":")[0].alias("item_token"),
        )
        .distinct()
        .withColumn("rating", F.lit(1.0))
        .withColumn("ts", F.lit(0).cast("bigint"))
    )
    return ratings_to_urm(ratings)


def icm_with_mapped_ids(icm_tokens: DataFrame, item_map: DataFrame) -> DataFrame:
    """Join a token-keyed ICM against the URM's item mapper → (item_id,
    feature, value); items absent from the URM are dropped (the
    reference's if_new_item='ignore' convention)."""
    feat_map = build_id_mapper(icm_tokens, "feature", "feature_id")
    return (
        icm_tokens.join(item_map, "item_token")
        .join(feat_map, "feature")
        .select("item_id", "feature", "feature_id", "value")
    )
