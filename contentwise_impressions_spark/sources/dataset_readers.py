"""Per-corpus dataset readers — the Data_manager/<corpus>/ connector layer.

Reference: each corpus gets a Reader class (e.g. Data_manager/Movielens/
Movielens20MReader.py, NetflixPrize, AmazonReviewData, ...; ~40-150 LoC
each) that downloads an archive, parses its rating file(s), and returns a
canonical Dataset (URM + ID mappers).  The parsing layer is always the
generic CSV loader with per-corpus conventions — which is exactly what
these functions are: thin convention wrappers over
:mod:`.ratings_csv`.  The download step is driver-side urllib in the
reference (DataReader_utils.py:312-337) and is intentionally not run here
(no network in the build environment); pass a local path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ratings_csv import load_ratings_csv, ratings_to_urm


def read_movielens(
    spark: SparkSession, ratings_path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Movielens 1M/10M `ratings.dat`: `user::item::rating::ts`.

    Reference: Data_manager/Movielens/*Reader.py (`::` separator, implicit
    header-less file, keep-last duplicate handling)."""
    ratings = load_ratings_csv(
        spark, ratings_path, sep="::", header=False,
        user_col=0, item_col=1, rating_col=2, ts_col=3,
    )
    return ratings_to_urm(ratings)


def read_movielens_csv(
    spark: SparkSession, ratings_path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Movielens 20M/latest `ratings.csv`: header + comma separator."""
    ratings = load_ratings_csv(
        spark, ratings_path, sep=",", header=True,
        user_col=0, item_col=1, rating_col=2, ts_col=3,
    )
    return ratings_to_urm(ratings)


def read_tsv_ratings(
    spark: SparkSession, path: str, has_ts: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Tab-separated `user item rating` corpora (Epinions, FilmTrust,
    Frappe, Gowalla — Data_manager/<name>/ readers)."""
    ratings = load_ratings_csv(
        spark, path, sep="\t", header=False,
        user_col=0, item_col=1, rating_col=2,
        ts_col=3 if has_ts else None, keep_last_by_ts=has_ts,
    )
    return ratings_to_urm(ratings)
