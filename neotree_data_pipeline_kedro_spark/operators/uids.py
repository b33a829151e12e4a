"""D8: duplicate-uid repair with deterministic surrogate ids (SURVEY §2.3).

Reference (data_tyding/maternal_data_duplicates_cleanup.py:12-64): sessions
sharing a uid but holding DIFFERENT DateAdmission values are distinct
patients; the first admission keeps the uid, every other (uid, date) group
gets a freshly minted NeoTree id ``[A-Z0-9]{2}ZZ-\\d{4}`` (random, collision
-checked against the sessions table, :50-64).

Random minting is not reproducible across a distributed re-run, so ids here
are a deterministic hash of (uid, date, salt) in the same surface format:
``upper(md5[0:2]) + 'ZZ-' + translate(md5[2:6], 'abcdef', '012345')``.
Collisions (with existing uids or between minted ids) resolve by bumping
the salt for the collided groups only — a driver loop over an
exponentially-shrinking set, each pass one small join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def minted_uid(uid: Column, date: Column, salt: int = 0) -> Column:
    """Deterministic ``XXZZ-NNNN`` surrogate for a (uid, date) episode."""
    h = F.md5(
        F.concat_ws("|", uid, F.coalesce(date.cast("string"), F.lit("\x00")), F.lit(str(salt)))
    )
    prefix = F.upper(F.substring(h, 1, 2))
    digits = F.translate(F.substring(h, 3, 4), "abcdef", "012345")
    return F.concat(prefix, F.lit("ZZ-"), digits)


def repair_duplicate_uids(
    df: DataFrame,
    uid_col: str = "uid",
    date_col: str = "date_admission",
    existing_uids: DataFrame | None = None,
    max_rounds: int = 8,
) -> DataFrame:
    """Return df with ``uid`` rewritten so each (uid, admission-date) episode
    has a distinct id: the first date per uid (ascending, NULLs first — the
    reference keeps whichever row it iterates first; this is the documented
    deterministic choice) keeps the original, later dates get minted ids.

    ``existing_uids``: optional single-column frame of ids already taken
    (the reference's ``row_exists`` collision probe against
    public.sessions).
    """
    groups = df.select(uid_col, date_col).distinct()
    w = Window.partitionBy(uid_col).orderBy(F.col(date_col).asc_nulls_first())
    ranked = groups.withColumn("__rk", F.row_number().over(w))
    keep = ranked.filter(F.col("__rk") == 1).select(
        uid_col, date_col, F.col(uid_col).alias("new_uid")
    )
    remint = ranked.filter(F.col("__rk") > 1).select(uid_col, date_col)

    taken = df.select(F.col(uid_col).alias("taken")).distinct()
    if existing_uids is not None:
        ex = existing_uids.select(
            F.col(existing_uids.columns[0]).alias("taken")
        ).distinct()
        taken = taken.unionByName(ex).distinct()

    minted = remint.withColumn(
        "new_uid", minted_uid(F.col(uid_col), F.col(date_col), 0)
    )
    for salt in range(1, max_rounds + 1):
        # collision: minted id equals a taken uid, or two groups minted alike
        dup_w = Window.partitionBy("new_uid").orderBy(
            F.col(uid_col), F.col(date_col).asc_nulls_first()
        )
        minted = minted.withColumn("__dup", F.row_number().over(dup_w))
        collided = (
            minted.join(taken, minted["new_uid"] == taken["taken"], "left")
            .withColumn("__hit", F.col("taken").isNotNull() | (F.col("__dup") > 1))
            .drop("taken")
        )
        if collided.filter("__hit").limit(1).count() == 0:
            minted = collided.drop("__hit", "__dup")
            break
        minted = collided.select(
            uid_col,
            date_col,
            F.when(
                F.col("__hit"), minted_uid(F.col(uid_col), F.col(date_col), salt)
            ).otherwise(F.col("new_uid")).alias("new_uid"),
        )
    else:
        minted = minted.drop("__dup") if "__dup" in minted.columns else minted

    mapping = keep.unionByName(minted.select(uid_col, date_col, "new_uid"))
    return (
        df.join(mapping, [uid_col, date_col], "left")
        .withColumn(uid_col, F.coalesce("new_uid", F.col(uid_col)))
        .drop("new_uid")
    )
