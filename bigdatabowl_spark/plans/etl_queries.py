"""ETL entry point (SURVEY §3.1) as an oracle-checked catalog query.

The reference's normalize.py lifecycle — games/plays joins, teamAbbr via
np.select, per-play LOS broadcast-back, left-play mirroring, velocity from
speed+angle (ball via frame diff), acceleration via per-entity diff,
rounding + projection — runs here through plans/tracking.normalize_tracking
over a RAW tracking table derived deterministically from the events table,
and the DuckDB oracle replicates the entire chain in SQL (windows, joins,
trig). That makes the whole of reference entry point 1 hash-checked, not
just unit-tested.

Determinism: the unrounded angle columns (v_theta, a_theta, s_dir_rad) are
excluded from the checked projection — libm vs JVM can differ in the last
ulp — and re-included as round(·, 6) query-level columns instead. The
2-decimal kinematics rounding is normalize.py:85 semantics (HALF_UP ==
DuckDB half-away-from-zero for these magnitudes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from bigdatabowl_spark.plans.catalog import register, t
from bigdatabowl_spark.plans.tracking import normalize_tracking

N_SLOTS = 8  # players per play (4 home / 4 away) + ball
N_FRAMES = 20
N_PLAYS = 2  # play 1 goes right, play 2 goes left (exercises mirroring)


def raw_tracking_from_events(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(raw, games, plays) built deterministically from events user_ids.

    Geometry is plain arithmetic over (slot, playId, frameId) plus a
    per-player jitter from user_id — chosen so every derived value is
    reproducible in the SQL oracle with the same integer/double ops.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    slots = (
        ev.select("user_id")
        .distinct()
        .withColumn("slot", F.row_number().over(Window.orderBy("user_id")) - 1)
        .filter(F.col("slot") < N_SLOTS)
    )
    plays = spark.range(1, N_PLAYS + 1).select(F.col("id").alias("playId"))
    frames = spark.range(1).select(
        F.explode(F.sequence(F.lit(1), F.lit(N_FRAMES))).alias("frameId")
    )
    base = slots.crossJoin(plays).crossJoin(frames)

    lane = (F.col("slot") % 4).cast("double")
    is_home = F.col("slot") < 4
    jit = (F.col("user_id") % 5).cast("double")
    event = (
        F.when(F.col("frameId") == 2, F.lit("ball_snap"))
        .when(F.col("frameId") == 18, F.lit("pass_forward"))
        .otherwise(F.lit(None).cast("string"))
    )
    f_d = F.col("frameId").cast("double")
    p_d = F.col("playId").cast("double")
    players = base.select(
        F.lit(1).cast("long").alias("gameId"),
        F.col("playId").cast("long"),
        F.col("frameId").cast("int"),
        event.alias("event"),
        (F.col("user_id") + 100).cast("long").alias("nflId"),
        F.concat(F.lit("P"), F.col("slot")).alias("displayName"),
        (F.col("slot") + 10).cast("int").alias("jerseyNumber"),
        F.when(is_home, F.lit("WR")).otherwise(F.lit("CB")).alias("position"),
        F.when(is_home, F.lit("home")).otherwise(F.lit("away")).alias("team"),
        F.lit(None).cast("string").alias("route"),
        F.when(F.col("playId") == 2, F.lit("left")).otherwise(F.lit("right")).alias("playDirection"),
        (20.0 + 6.0 * lane + 0.3 * f_d + 0.7 * jit + p_d).alias("x"),
        (6.0 + 9.0 * lane + F.when(is_home, 0.0).otherwise(2.0)).alias("y"),
        (3.0 + 0.4 * lane + 0.1 * jit).alias("s"),
        (30.0 * lane + 10.0 * jit + p_d).alias("o"),
        (45.0 * lane + 20.0 * jit + 3.0 * p_d).alias("dir"),
        F.lit(0.4).alias("dis"),
        (0.8 + 0.1 * lane).alias("a"),
    )
    ball = plays.crossJoin(frames).select(
        F.lit(1).cast("long").alias("gameId"),
        F.col("playId").cast("long"),
        F.col("frameId").cast("int"),
        event.alias("event"),
        F.lit(None).cast("long").alias("nflId"),
        F.lit("Football").alias("displayName"),
        F.lit(None).cast("int").alias("jerseyNumber"),
        F.lit(None).cast("string").alias("position"),
        F.lit("football").alias("team"),
        F.lit(None).cast("string").alias("route"),
        F.when(F.col("playId") == 2, F.lit("left")).otherwise(F.lit("right")).alias("playDirection"),
        (28.0 + F.col("playId").cast("double") + 0.5 * F.col("frameId").cast("double")).alias("x"),
        F.lit(26.5).alias("y"),
        F.lit(5.0).alias("s"),
        F.lit(0.0).alias("o"),
        F.lit(0.0).alias("dir"),
        F.lit(0.5).alias("dis"),
        F.lit(0.0).alias("a"),
    )
    raw = players.unionByName(ball)
    games = spark.createDataFrame(
        [(1, "HOME", "AWAY")], "gameId long, homeTeamAbbr string, visitorTeamAbbr string"
    )
    plays_dim = spark.createDataFrame(
        [(1, 1, "HOME"), (1, 2, "AWAY")],
        "gameId long, playId long, possessionTeam string",
    )
    return raw, games, plays_dim


# The oracle rebuilds raw -> normalized entirely in SQL. CTE mirrors the
# Spark construction 1:1; the normalize chain mirrors tracking.py.
_ETL_ORACLE = """
WITH slots AS (
    SELECT user_id, ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS slot
    FROM (SELECT DISTINCT user_id FROM events)
    QUALIFY slot < 8
),
plays AS (SELECT unnest(generate_series(1, 2)) AS playId),
frames AS (SELECT unnest(generate_series(1, 20)) AS frameId),
praw AS (
    SELECT CAST(1 AS BIGINT) AS gameId, p.playId, CAST(f.frameId AS INTEGER) AS frameId,
           CASE WHEN f.frameId = 2 THEN 'ball_snap'
                WHEN f.frameId = 18 THEN 'pass_forward' END AS event,
           CAST(s.user_id + 100 AS BIGINT) AS nflId,
           'P' || s.slot AS displayName,
           CASE WHEN s.slot < 4 THEN 'WR' ELSE 'CB' END AS position,
           CASE WHEN s.slot < 4 THEN 'home' ELSE 'away' END AS team,
           CASE WHEN p.playId = 2 THEN 'left' ELSE 'right' END AS playDirection,
           20.0 + 6.0*(s.slot % 4) + 0.3*f.frameId + 0.7*(s.user_id % 5) + p.playId AS x,
           6.0 + 9.0*(s.slot % 4) + CASE WHEN s.slot < 4 THEN 0.0 ELSE 2.0 END AS y,
           3.0 + 0.4*(s.slot % 4) + 0.1*(s.user_id % 5) AS s,
           30.0*(s.slot % 4) + 10.0*(s.user_id % 5) + p.playId AS o,
           45.0*(s.slot % 4) + 20.0*(s.user_id % 5) + 3.0*p.playId AS dir
    FROM slots s, plays p, frames f
),
braw AS (
    SELECT CAST(1 AS BIGINT) AS gameId, p.playId, CAST(f.frameId AS INTEGER) AS frameId,
           CASE WHEN f.frameId = 2 THEN 'ball_snap'
                WHEN f.frameId = 18 THEN 'pass_forward' END AS event,
           CAST(0 AS BIGINT) AS nflId, 'Football' AS displayName,
           CAST(NULL AS VARCHAR) AS position, 'football' AS team,
           CASE WHEN p.playId = 2 THEN 'left' ELSE 'right' END AS playDirection,
           28.0 + p.playId + 0.5*f.frameId AS x, 26.5 AS y,
           5.0 AS s, 0.0 AS o, 0.0 AS dir
    FROM plays p, frames f
),
raw AS (SELECT * FROM praw UNION ALL SELECT * FROM braw),
dims AS (
    SELECT r.*,
           CASE WHEN team = 'home' THEN 'HOME'
                WHEN team = 'away' THEN 'AWAY' ELSE 'FTBL' END AS teamAbbr,
           CASE WHEN team = 'football' THEN 'FTBL'
                WHEN (CASE WHEN team = 'home' THEN 'HOME' ELSE 'AWAY' END) =
                     (CASE WHEN playId = 1 THEN 'HOME' ELSE 'AWAY' END)
                THEN 'OFF' ELSE 'DEF' END AS team_pos
    FROM raw r
),
with_los AS (
    SELECT d.*,
           FIRST_VALUE(CASE WHEN event = 'ball_snap' AND displayName = 'Football'
                            THEN x END IGNORE NULLS)
               OVER (PARTITION BY gameId, playId) AS los
    FROM dims d
),
mirrored AS (
    SELECT gameId, playId, frameId, event, nflId, displayName, position,
           team, team_pos, teamAbbr,
           CASE WHEN playDirection = 'left' THEN 120.0 - x ELSE x END AS x,
           CASE WHEN playDirection = 'left' THEN 160.0/3 - y ELSE y END AS y,
           s,
           CASE WHEN playDirection = 'left'
                THEN ((o + 180.0) % 360.0 + 360.0) % 360.0 ELSE o END AS o,
           CASE WHEN playDirection = 'left'
                THEN ((dir + 180.0) % 360.0 + 360.0) % 360.0 ELSE dir END AS dir,
           CASE WHEN playDirection = 'left' THEN 120.0 - los ELSE los END AS los
    FROM with_los
),
vel AS (
    SELECT m.*,
           (((90.0 - dir) % 360.0) + 360.0) % 360.0 AS s_dir,
           CASE WHEN nflId = 0
                THEN COALESCE((x - LAG(x) OVER w) / 0.1, 0.0)
                ELSE s * cos(radians((((90.0 - dir) % 360.0) + 360.0) % 360.0)) END AS v_x,
           CASE WHEN nflId = 0
                THEN COALESCE((y - LAG(y) OVER w) / 0.1, 0.0)
                ELSE s * sin(radians((((90.0 - dir) % 360.0) + 360.0) % 360.0)) END AS v_y
    FROM mirrored m
    WINDOW w AS (PARTITION BY gameId, playId, nflId ORDER BY frameId)
),
acc AS (
    SELECT v.*,
           COALESCE((v_x - LAG(v_x) OVER w2) / 0.1, 0.0) AS a_x,
           COALESCE((v_y - LAG(v_y) OVER w2) / 0.1, 0.0) AS a_y
    FROM vel v
    WINDOW w2 AS (PARTITION BY gameId, playId, nflId ORDER BY frameId)
)
SELECT gameId, playId, frameId, event, nflId, displayName, position,
       team_pos, teamAbbr,
       round(x, 2) AS x, round(y, 2) AS y,
       round(los, 2) AS los,
       round(v_x, 2) AS v_x, round(v_y, 2) AS v_y,
       round(sqrt(v_x*v_x + v_y*v_y), 2) AS v_mag,
       round(a_x, 2) AS a_x, round(a_y, 2) AS a_y,
       round(sqrt(a_x*a_x + a_y*a_y), 2) AS a_mag,
       round(s_dir, 6) AS s_dir_r
FROM acc
"""


@register("etl_normalize_tracking", "J1,J2,J4,P9,P11,A4,F1,F2,F5,F6,W1", _ETL_ORACLE)
def etl_normalize_tracking(spark: SparkSession, sf_dir: str):
    """Reference entry point 1 (normalize.py:13-101) end-to-end, hash-checked.

    Raw tracking derived from events → normalize_tracking (games/plays
    broadcast joins, teamAbbr select, LOS window broadcast-back, left-play
    mirroring, velocity/acceleration window diffs, rounding) → checked
    projection. The full SQL twin recomputes every step in DuckDB."""
    raw, games, plays = raw_tracking_from_events(spark, sf_dir)
    norm = normalize_tracking(raw, games, plays)
    return norm.select(
        "gameId", "playId", "frameId", "event", "nflId", "displayName",
        "position", "team_pos", "teamAbbr", "x", "y", "los",
        "v_x", "v_y", "v_mag", "a_x", "a_y", "a_mag",
        F.round("s_dir", 6).alias("s_dir_r"),
    )
