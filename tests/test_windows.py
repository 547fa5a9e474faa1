"""Arrow-native window/set-op stages (stages/windows.py, stages/setops.py):
semantics vs serial reference computations, plus edge shapes."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from fastq_dupaway_ray.stages.setops import keyed_set_op
from fastq_dupaway_ray.stages.windows import hopping_window, sessionize, tumbling_window


def _events(n=2000, users=17, seed=7):
    rng = np.random.default_rng(seed)
    ts = pd.Timestamp("2025-03-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 86_400_000, size=n)), unit="ms"
    )
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, users, size=n).astype(np.int64),
            "ts": ts,
            "value": rng.normal(size=n).round(3),
        }
    )


def test_tumbling_window_matches_pandas(ray_session):
    df = _events()
    got = (
        tumbling_window(rd.from_pandas(df).repartition(5), width_minutes=60)
        .to_pandas()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    exp = (
        df.assign(window_start=df["ts"].dt.floor("h"))
        .groupby(["user_id", "window_start"], as_index=False)
        .agg(sum_value=("value", "sum"), n_events=("value", "size"))
    )
    exp["sum_value"] = exp["sum_value"].round(6)
    exp = exp.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hopping_window_each_event_in_two_windows(ray_session):
    df = _events(500)
    got = hopping_window(
        rd.from_pandas(df).repartition(3), width_minutes=60, hop_minutes=30
    ).to_pandas()
    # every event contributes to exactly width/hop = 2 windows
    assert got["n_events"].sum() == 2 * len(df)
    # a specific event is counted in both its slot and the previous one
    slot = df["ts"].iloc[0].floor("30min")
    u = df["user_id"].iloc[0]
    w = got[got["user_id"] == u].set_index("window_start")
    assert slot in w.index and slot - pd.Timedelta(minutes=30) in w.index


def test_hopping_window_rejects_non_multiple(ray_session):
    with pytest.raises(ValueError, match="multiple"):
        hopping_window(rd.from_pandas(_events(10)), width_minutes=45, hop_minutes=30)


def test_sessionize_matches_pandas(ray_session):
    df = _events(3000, users=11, seed=13)
    got = (
        sessionize(rd.from_pandas(df).repartition(7), gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    d = df.sort_values(["user_id", "ts"], kind="mergesort")
    new = (d["ts"] - d.groupby("user_id")["ts"].shift()).gt(
        pd.Timedelta(minutes=30)
    ) | d["user_id"].ne(d["user_id"].shift())
    d = d.assign(_s=new.cumsum())
    exp = d.groupby(["user_id", "_s"], as_index=False).agg(
        session_start=("ts", "min"),
        session_end=("ts", "max"),
        n_events=("ts", "size"),
        sum_value=("value", "sum"),
    )[["user_id", "session_start", "session_end", "n_events", "sum_value"]]
    exp["sum_value"] = exp["sum_value"].round(6)
    exp = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sessionize_single_event_sessions(ray_session):
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2], dtype=np.int64),
            "ts": pd.to_datetime(
                ["2025-01-01 00:00", "2025-01-01 02:00", "2025-01-01 00:10"]
            ),
            "value": [1.0, 2.0, 3.0],
        }
    )
    got = sessionize(rd.from_pandas(df), gap_minutes=30).to_pandas()
    assert len(got) == 3  # every event its own session (gaps exceed 30min)
    assert (got["n_events"] == 1).all()


def test_keyed_set_op_matches_python_sets(ray_session):
    rng = np.random.default_rng(3)
    a = pd.DataFrame({"text": [f"k{int(i)}" for i in rng.integers(0, 60, 300)]})
    b = pd.DataFrame({"text": [f"k{int(i)}" for i in rng.integers(30, 90, 300)]})
    inter = keyed_set_op(rd.from_pandas(a), rd.from_pandas(b), "intersect").to_pandas()
    exc = keyed_set_op(rd.from_pandas(a), rd.from_pandas(b), "except").to_pandas()
    sa, sb = set(a["text"]), set(b["text"])
    assert set(inter["text"]) == sa & sb and len(inter) == len(sa & sb)
    assert set(exc["text"]) == sa - sb and len(exc) == len(sa - sb)


def test_keyed_set_op_integer_keys(ray_session):
    a = pd.DataFrame({"k": np.arange(50, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(25, 75, dtype=np.int64)})
    inter = keyed_set_op(rd.from_pandas(a), rd.from_pandas(b), "intersect", key_col="k").to_pandas()
    assert sorted(inter["k"]) == list(range(25, 50))


def test_keyed_set_op_bad_op(ray_session):
    a = rd.from_pandas(pd.DataFrame({"text": ["x"]}))
    with pytest.raises(ValueError, match="intersect"):
        keyed_set_op(a, a, "union")


def test_tumbling_window_pre_epoch_and_null_values(ray_session):
    """Floor must go toward -inf for pre-1970 timestamps (pc.divide
    truncates toward zero) and n_events must count rows, not non-null
    values — both match pandas and the SQL oracle."""
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 1], dtype=np.int64),
            "ts": pd.to_datetime(
                ["1969-12-31 23:30:00", "1969-12-31 23:45:00", "2025-01-01 10:10:00"]
            ),
            "value": [1.0, np.nan, 2.0],
        }
    )
    got = (
        tumbling_window(rd.from_pandas(df), width_minutes=60)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    assert got["window_start"].iloc[0] == pd.Timestamp("1969-12-31 23:00:00")
    assert got["n_events"].tolist() == [2, 1]  # the null-value row counts


def test_tumbling_window_null_timestamps(ray_session):
    """Null timestamps form a NULL window group (date_trunc(NULL) semantics)
    instead of crashing the floor kernel."""
    df = pd.DataFrame(
        {
            "user_id": np.array([1, 1], dtype=np.int64),
            "ts": pd.to_datetime(["2025-01-01 10:10:00", None]),
            "value": [1.0, 2.0],
        }
    )
    got = tumbling_window(rd.from_pandas(df), width_minutes=60).to_pandas()
    assert len(got) == 2
    assert got["window_start"].isna().sum() == 1


def test_sessionize_hot_key_chunked_exact(ray_session):
    """One user with ~1e6 events (plus normal keys) resolves identically
    through the chunked two-stage path, the legacy single-exchange path and
    a serial reference scan — the hot-key hardening is exact, and sessions
    spanning MANY time chunks re-merge correctly."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fastq_dupaway_ray.stages.windows import sessionize

    rng = np.random.default_rng(11)
    n_hot = 1_000_000
    # hot user: mostly sub-gap deltas so long sessions cross chunk borders,
    # with occasional > gap breaks
    deltas = np.where(
        rng.random(n_hot) < 0.0005,
        rng.integers(31, 300, n_hot),  # minutes — breaks
        rng.integers(0, 20, n_hot),    # minutes — same session
    ).astype("int64")
    hot_ts = pd.Timestamp("2025-01-01").value // 1000 + np.cumsum(deltas) * 60_000_000
    cold_n = 5_000
    cold_ts = (
        pd.Timestamp("2025-01-01").value // 1000
        + rng.integers(0, 90 * 24 * 60, cold_n) * 60_000_000
    )
    df = pd.DataFrame(
        {
            "user_id": np.concatenate(
                [np.zeros(n_hot, dtype=np.int64), rng.integers(1, 50, cold_n)]
            ),
            "ts": np.concatenate([hot_ts, cold_ts]).astype("datetime64[us]"),
            "value": np.ones(n_hot + cold_n),  # exact float sums
        }
    )

    def canon(out):
        return (
            out.to_pandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )

    src = rd.from_pandas(df).repartition(16)
    chunked = canon(sessionize(src, gap_minutes=30, round_digits=None))
    legacy = canon(
        sessionize(src, gap_minutes=30, round_digits=None, time_chunk_minutes=None)
    )
    pd.testing.assert_frame_equal(chunked, legacy)

    # serial reference for the hot key alone
    hs = np.sort(hot_ts)
    brk = np.ones(n_hot, dtype=bool)
    brk[1:] = (hs[1:] - hs[:-1]) > 30 * 60_000_000
    n_sessions_hot = int(brk.sum())
    got_hot = chunked[chunked["user_id"] == 0]
    assert len(got_hot) == n_sessions_hot
    assert int(got_hot["n_events"].sum()) == n_hot
    # at least one merged session spans multiple 1440-minute chunks
    span_min = (
        got_hot["session_end"] - got_hot["session_start"]
    ).dt.total_seconds().max() / 60
    assert span_min > 1440


def test_sessionize_empty_and_string_keys(ray_session):
    """Empty input with STRING keys through the chunked default: the
    boundary exchange's typed-empty fallback must not poison the union
    (int64 vs string key type)."""
    import pandas as pd
    import ray.data as rd

    from fastq_dupaway_ray.stages.windows import sessionize

    df = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype=str),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "value": pd.Series([], dtype=float),
        }
    )
    out = sessionize(rd.from_pandas(df)).to_pandas()
    assert len(out) == 0
    # and a tiny string-keyed input still resolves
    df2 = pd.DataFrame(
        {
            "user_id": ["u", "u", "v"],
            "ts": pd.to_datetime(
                ["2025-01-01 00:00", "2025-01-01 00:10", "2025-01-02 09:00"]
            ),
            "value": [1.0, 2.0, 3.0],
        }
    )
    out2 = (
        sessionize(rd.from_pandas(df2)).to_pandas().sort_values("user_id")
    )
    assert out2["n_events"].tolist() == [2, 1]
