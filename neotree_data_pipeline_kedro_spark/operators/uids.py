"""D8: duplicate-uid repair with deterministic surrogate ids (SURVEY §2.3).

Reference (data_tyding/maternal_data_duplicates_cleanup.py:12-64): sessions
sharing a uid but holding DIFFERENT DateAdmission values are distinct
patients; the first admission keeps the uid, every other (uid, date) group
gets a freshly minted NeoTree id ``[A-Z0-9]{2}ZZ-\\d{4}`` (random, collision
-checked against the sessions table, :50-64).

Random minting is not reproducible across a distributed re-run, so ids here
are a deterministic hash of (uid, date, salt) in the same surface format:
``upper(md5[0:2]) + 'ZZ-' + translate(md5[2:6], 'abcdef', '012345')``.
Collisions (with existing uids or between minted ids) are resolved in ONE
pass: the collided groups — a tiny set, real uids almost never carry the
``ZZ`` infix and the minted space is ~2.6M ids — are collected to the
driver, candidate ids for salts 1..N are probed against the taken set with
a single semi-join, and the resolution mapping broadcasts back. No
iterative lineage, no per-round actions (the round-2 shape re-scanned the
input once per salt round).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def minted_uid(uid: Column, date: Column, salt: int | Column = 0) -> Column:
    """Deterministic ``XXZZ-NNNN`` surrogate for a (uid, date) episode."""
    salt_col = F.lit(str(salt)) if isinstance(salt, int) else salt.cast("string")
    h = F.md5(
        F.concat_ws("|", uid, F.coalesce(date.cast("string"), F.lit("\x00")), salt_col)
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
    ).persist()

    # collision: minted id equals a taken uid, or two groups minted alike.
    # The collided set is tiny (see module docstring); ONE action collects it.
    dup_w = Window.partitionBy("new_uid").orderBy(
        F.col(uid_col), F.col(date_col).asc_nulls_first()
    )
    collided = (
        minted.withColumn("__dup", F.row_number().over(dup_w))
        .join(taken, F.col("new_uid") == F.col("taken"), "left")
        .filter(F.col("taken").isNotNull() | (F.col("__dup") > 1))
        .select(uid_col, date_col)
        .collect()
    )
    if collided:
        spark = df.sparkSession
        key_schema = minted.select(uid_col, date_col).schema
        groups_df = spark.createDataFrame(collided, key_schema)
        cands = groups_df.crossJoin(
            spark.range(1, max_rounds + 1).select(F.col("id").alias("__salt"))
        ).withColumn(
            "cand", minted_uid(F.col(uid_col), F.col(date_col), F.col("__salt"))
        )
        # one probe: which candidates are already taken (by real uids or by
        # any salt-0 minted id, collided or not)
        taken_plus = taken.unionByName(
            minted.select(F.col("new_uid").alias("taken"))
        )
        burned = {
            r["cand"]
            for r in cands.join(
                taken_plus, F.col("cand") == F.col("taken"), "left_semi"
            ).collect()
        }
        by_group: dict[tuple, list] = {}
        for r in cands.collect():
            by_group.setdefault((r[uid_col], r[date_col]), []).append(
                (r["__salt"], r["cand"])
            )
        resolved = []
        for key in sorted(by_group, key=lambda k: (str(k[0]), str(k[1]))):
            pick = next(
                (c for _, c in sorted(by_group[key]) if c not in burned), None
            )
            if pick is None:
                raise RuntimeError(
                    f"uid repair: no free surrogate id for group {key} "
                    f"within {max_rounds} salts"
                )
            burned.add(pick)  # later groups must not reuse it
            resolved.append((*key, pick))
        res_df = F.broadcast(
            spark.createDataFrame(
                resolved,
                minted.select(uid_col, date_col).schema.add(
                    "__resolved_uid", "string"
                ),
            )
        )
        minted = (
            minted.join(res_df, [uid_col, date_col], "left")
            .withColumn("new_uid", F.coalesce("__resolved_uid", F.col("new_uid")))
            .drop("__resolved_uid")
        )

    mapping = keep.unionByName(minted.select(uid_col, date_col, "new_uid"))
    return (
        df.join(mapping, [uid_col, date_col], "left")
        .withColumn(uid_col, F.coalesce("new_uid", F.col(uid_col)))
        .drop("new_uid")
    )
