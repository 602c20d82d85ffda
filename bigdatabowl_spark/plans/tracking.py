"""Tracking-data ETL: the reference's normalize.py lifecycle, Spark-first.

Reference entry point 1 (SURVEY §3.1): per-week pandas ETL parallelized with
multiprocessing.Pool. Here it is one declarative DataFrame pipeline — Catalyst
prunes/pushes, window functions replace groupby.diff, and partition-by-gameId
replaces the process pool. No catalog/oracle entries (the driver's testdata has
no tracking table); correctness is covered by tests/test_tracking.py against
a deterministic synthetic fixture per FIXTURES.md §1.

Reference citations: data_processing/normalize.py:13-101.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# position → position_general dict map (normalize.py:87-90)
POSITION_GENERAL = {
    "QB": "QB",
    "WR": "WR",
    "TE": "TE",
    "RB": "RB", "HB": "RB", "FB": "RB",
    "CB": "DB", "DB": "DB", "S": "DB", "SS": "DB", "FS": "DB",
    "MLB": "LB", "OLB": "LB", "ILB": "LB", "LB": "LB",
    "DL": "DL", "DT": "DL", "DE": "DL", "NT": "DL",
    "P": "ST", "K": "ST", "LS": "ST",
}

FRAME_DT = 0.1  # 10 Hz tracking (normalize.py:67-70)


def _position_general_col() -> F.Column:
    pairs = []
    for k, v in POSITION_GENERAL.items():
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)[F.col("position")]


def normalize_tracking(raw: DataFrame, games: DataFrame, plays: DataFrame) -> DataFrame:
    """Raw week tracking → normalized central fact table (normalize.py:13-95).

    Steps (reference line refs in comments):
      ball id fill (:20) → games join + teamAbbr (:22-26) → plays join +
      team_pos (:28-31) → per-play LOS broadcast-back (:35-37) → left-play
      mirroring (:43-57) → velocity from speed+angle, ball velocity via
      frame diff (:62-70) → acceleration via per-player diff (:75-82) →
      rounding + position map + 30-col projection (:85-95).
    """
    df = raw.withColumn("nflId", F.coalesce(F.col("nflId"), F.lit(0)))  # :20
    if "time" not in df.columns:
        df = df.withColumn("time", F.lit(None).cast("timestamp"))

    # J1 games join → teamAbbr via 3-way np.select (:22-26)
    df = df.join(F.broadcast(games.select("gameId", "homeTeamAbbr", "visitorTeamAbbr")), "gameId", "left")
    df = df.withColumn(
        "teamAbbr",
        F.when(F.col("team") == "home", F.col("homeTeamAbbr"))
        .when(F.col("team") == "away", F.col("visitorTeamAbbr"))
        .otherwise(F.lit("FTBL")),
    ).drop("homeTeamAbbr", "visitorTeamAbbr")

    # J2 plays join → OFF/DEF/FTBL (:28-31)
    df = df.join(F.broadcast(plays.select("gameId", "playId", "possessionTeam")), ["gameId", "playId"], "left")
    df = df.withColumn(
        "team_pos",
        F.when(F.col("team") == "football", F.lit("FTBL"))
        .when(F.col("teamAbbr") == F.col("possessionTeam"), F.lit("OFF"))
        .otherwise(F.lit("DEF")),
    ).drop("possessionTeam")

    # J4: per-play LOS = ball x at ball_snap, broadcast back to all rows (:35-37)
    w_play = Window.partitionBy("gameId", "playId")
    los_expr = F.first(
        F.when(
            (F.col("event") == "ball_snap") & (F.col("displayName") == "Football"),
            F.col("x"),
        ),
        ignorenulls=True,
    ).over(w_play)
    df = df.withColumn("los", los_expr)

    # P11: mirror left-direction plays into canonical left-to-right (:43-57)
    is_left = F.col("playDirection") == "left"
    df = (
        df.withColumn("x", F.when(is_left, 120.0 - F.col("x")).otherwise(F.col("x")))
        .withColumn("y", F.when(is_left, 160.0 / 3 - F.col("y")).otherwise(F.col("y")))
        .withColumn("o", F.when(is_left, F.pmod(F.col("o") + 180.0, F.lit(360.0))).otherwise(F.col("o")))
        .withColumn("dir", F.when(is_left, F.pmod(F.col("dir") + 180.0, F.lit(360.0))).otherwise(F.col("dir")))
        .withColumn("los", F.when(is_left, 120.0 - F.col("los")).otherwise(F.col("los")))
    )

    # Velocity from speed + direction (players); ball velocity via frame diff
    # (:60-70). s_dir: 0° = +y axis in tracking convention → convert.
    df = df.withColumn("s_dir", F.pmod(F.lit(90.0) - F.col("dir"), F.lit(360.0)))
    df = df.withColumn("s_dir_rad", F.radians("s_dir"))
    w_ent = Window.partitionBy("gameId", "playId", "nflId").orderBy("frameId")
    is_ball = F.col("nflId") == 0
    v_x_player = F.col("s") * F.cos("s_dir_rad")
    v_y_player = F.col("s") * F.sin("s_dir_rad")
    v_x_ball = (F.col("x") - F.lag("x").over(w_ent)) / FRAME_DT
    v_y_ball = (F.col("y") - F.lag("y").over(w_ent)) / FRAME_DT
    df = (
        df.withColumn("v_x", F.when(is_ball, v_x_ball).otherwise(v_x_player))
        .withColumn("v_y", F.when(is_ball, v_y_ball).otherwise(v_y_player))
    )
    # group-fill first ball frame with 0 (reference fillna, :68-70)
    df = df.withColumn("v_x", F.coalesce("v_x", F.lit(0.0))).withColumn(
        "v_y", F.coalesce("v_y", F.lit(0.0))
    )
    df = df.withColumn("v_theta", F.atan2("v_y", "v_x")).withColumn(
        "v_mag", F.sqrt(F.col("v_x") ** 2 + F.col("v_y") ** 2)
    )

    # Acceleration via per-entity diff of velocity (:75-82)
    a_x = (F.col("v_x") - F.lag("v_x").over(w_ent)) / FRAME_DT
    a_y = (F.col("v_y") - F.lag("v_y").over(w_ent)) / FRAME_DT
    df = (
        df.withColumn("a_x", F.coalesce(a_x, F.lit(0.0)))
        .withColumn("a_y", F.coalesce(a_y, F.lit(0.0)))
        .withColumn("a_theta", F.atan2("a_y", "a_x"))
        .withColumn("a_mag", F.sqrt(F.col("a_x") ** 2 + F.col("a_y") ** 2))
        .withColumnRenamed("a", "a_old")
    )

    # Rounding (:85), position map (:87-90), frozen 30-col projection (:92-95)
    for c in ("x", "y", "v_x", "v_y", "v_mag", "a_x", "a_y", "a_mag", "los"):
        df = df.withColumn(c, F.round(F.col(c), 2))
    df = df.withColumn("position_general", _position_general_col())

    return df.select(
        "gameId", "playId", "frameId", "event", "nflId", "displayName",
        "jerseyNumber", "position", "position_general", "team", "team_pos",
        "teamAbbr", "route", "time", "los", "x", "y", "dis", "o", "s",
        "s_dir", "s_dir_rad", "v_x", "v_y", "v_theta", "v_mag",
        "a_old", "a_x", "a_y", "a_theta", "a_mag",
    )


def rolling_speed_leaders(norm: DataFrame, players_per_position: int = 20, window_frames: int = 20) -> DataFrame:
    """Phase-1 slice query: top players by rolling-window max speed per
    position (movement_stats.ipynb · cells 2-5 / SURVEY §7 Phase 1)."""
    w_roll = (
        Window.partitionBy("gameId", "playId", "nflId")
        .orderBy("frameId")
        .rowsBetween(-(window_frames - 1), Window.currentRow)
    )
    rolled = norm.filter(F.col("nflId") != 0).withColumn(
        "roll_speed", F.avg("s").over(w_roll)
    )
    per_player = rolled.groupBy("nflId", "displayName", "position_general").agg(
        F.max("roll_speed").alias("max_roll_speed")
    )
    w_rank = Window.partitionBy("position_general").orderBy(
        F.desc("max_roll_speed"), F.asc("nflId")
    )
    return (
        per_player.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= players_per_position)
    )
