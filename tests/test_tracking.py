"""Tracking normalize ETL tests on a deterministic synthetic fixture
(FIXTURES.md §1 schema; generator constraints from normalize.py semantics)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from bigdatabowl_spark.plans.tracking import normalize_tracking, rolling_speed_leaders


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    rows = []
    # 2 games × 2 plays × 6 frames; 2 players + ball per play (tiny but
    # structurally faithful: snap event, left/right direction, QB/WR).
    for gid, direction in ((1, "right"), (2, "left")):
        for pid in (100, 200):
            for fid in range(1, 7):
                event = "ball_snap" if fid == 2 else ("pass_forward" if fid == 5 else None)
                # ball (raw nflId NULL)
                rows.append(
                    (gid, pid, fid, event, None, "Football", None, None, "football",
                     direction, None, 10.0 + fid, 26.65, 0.0, 0.0, 0.1, 0.0, 0.0)
                )
                for pi, (nid, pos, team) in enumerate(
                    [(11, "QB", "home"), (22, "WR", "away")]
                ):
                    rows.append(
                        (gid, pid, fid, event, nid, f"Player {nid}", 10 + pi, pos, team,
                         direction, "GO" if pos == "WR" else None,
                         20.0 + fid + pi, 20.0 + pi, 5.0, 1.0, 0.5, 90.0, 45.0)
                    )
    raw = spark.createDataFrame(
        rows,
        "gameId long, playId long, frameId int, event string, nflId long, "
        "displayName string, jerseyNumber int, position string, team string, "
        "playDirection string, route string, x double, y double, s double, "
        "a double, dis double, o double, dir double",
    )
    games = spark.createDataFrame(
        [(1, 1, "HOME1", "AWAY1"), (2, 1, "HOME2", "AWAY2")],
        "gameId long, week int, homeTeamAbbr string, visitorTeamAbbr string",
    )
    plays = spark.createDataFrame(
        [(1, 100, "HOME1"), (1, 200, "AWAY1"), (2, 100, "HOME2"), (2, 200, "AWAY2")],
        "gameId long, playId long, possessionTeam string",
    )
    return raw, games, plays


def test_normalize_schema_and_keys(spark, fixture_dfs):
    raw, games, plays = fixture_dfs
    norm = normalize_tracking(raw, games, plays).cache()
    assert norm.columns == [
        "gameId", "playId", "frameId", "event", "nflId", "displayName",
        "jerseyNumber", "position", "position_general", "team", "team_pos",
        "teamAbbr", "route", "time", "los", "x", "y", "dis", "o", "s",
        "s_dir", "s_dir_rad", "v_x", "v_y", "v_theta", "v_mag",
        "a_old", "a_x", "a_y", "a_theta", "a_mag",
    ] or set(norm.columns) >= {
        "gameId", "playId", "frameId", "nflId", "team_pos", "los", "v_x", "a_x",
    }
    # ball id filled to 0 (normalize.py:20)
    assert norm.filter(F.col("displayName") == "Football").filter(F.col("nflId") != 0).count() == 0


def test_team_pos_assignment(spark, fixture_dfs):
    raw, games, plays = fixture_dfs
    norm = normalize_tracking(raw, games, plays)
    tp = {
        (r.gameId, r.playId, r.nflId): r.team_pos
        for r in norm.select("gameId", "playId", "nflId", "team_pos").distinct().collect()
    }
    # game 1 play 100: HOME1 possesses → home player 11 OFF, away 22 DEF
    assert tp[(1, 100, 11)] == "OFF" and tp[(1, 100, 22)] == "DEF"
    # game 1 play 200: AWAY1 possesses → reversed
    assert tp[(1, 200, 11)] == "DEF" and tp[(1, 200, 22)] == "OFF"
    assert tp[(1, 100, 0)] == "FTBL"


def test_los_broadcast_and_mirroring(spark, fixture_dfs):
    raw, games, plays = fixture_dfs
    norm = normalize_tracking(raw, games, plays)
    los = norm.select("gameId", "playId", "los").distinct().collect()
    for r in los:
        # snap at frame 2: ball x = 12.0; mirrored for game 2 (left)
        expected = 12.0 if r.gameId == 1 else 120.0 - 12.0
        assert r.los == expected, (r.gameId, r.playId, r.los, expected)
    # mirrored x for left-direction game
    g2 = norm.filter((F.col("gameId") == 2) & (F.col("nflId") == 11) & (F.col("frameId") == 1)).first()
    assert g2.x == pytest.approx(120.0 - 21.0, abs=0.01)


def test_ball_velocity_is_frame_diff(spark, fixture_dfs):
    raw, games, plays = fixture_dfs
    norm = normalize_tracking(raw, games, plays)
    ball = (
        norm.filter((F.col("gameId") == 1) & (F.col("playId") == 100) & (F.col("nflId") == 0))
        .orderBy("frameId")
        .collect()
    )
    # ball x advances 1.0/frame → v_x = 1.0/0.1 = 10; first frame filled 0
    assert ball[0].v_x == 0.0
    for b in ball[1:]:
        assert b.v_x == pytest.approx(10.0, abs=0.01)


def test_player_velocity_from_speed_direction(spark, fixture_dfs):
    raw, games, plays = fixture_dfs
    norm = normalize_tracking(raw, games, plays)
    p = norm.filter((F.col("gameId") == 1) & (F.col("nflId") == 11) & (F.col("frameId") == 3)).first()
    # dir=45° → s_dir=45°, v_x = s·cos(45°)
    assert p.v_x == pytest.approx(5.0 * math.cos(math.radians(45.0)), abs=0.01)
    assert p.v_y == pytest.approx(5.0 * math.sin(math.radians(45.0)), abs=0.01)


def test_rolling_speed_leaders_shape(spark, fixture_dfs):
    raw, games, plays = fixture_dfs
    norm = normalize_tracking(raw, games, plays)
    leaders = rolling_speed_leaders(norm, players_per_position=5, window_frames=3)
    rows = leaders.collect()
    assert rows
    assert {r.position_general for r in rows} <= {"QB", "WR"}
    assert all(r.rnk <= 5 for r in rows)
