"""Window operator tests (tumbling / sliding / session)."""

import pandas as pd
import ray.data


def _events():
    rows = []
    base = 1_700_000_000 * 1_000_000  # epoch us
    # user 1: two sessions separated by a 2h gap
    for offset in (0, 60, 120, 7200 + 180, 7200 + 240):
        rows.append({"user_id": 1, "ts": base + offset * 1_000_000, "value": 1.0})
    # user 2: one event
    rows.append({"user_id": 2, "ts": base + 30 * 1_000_000, "value": 2.5})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    return ray.data.from_pandas(df)


def test_session_window(ray_session):
    from yago4_ray.dataops.windows import session_window

    out = session_window(_events(), "user_id", "ts", gap_s=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start_us")
    assert len(u1) == 2
    assert list(u1["n_events"]) == [3, 2]
    assert len(out[out["user_id"] == 2]) == 1


def test_tumbling_window(ray_session):
    from yago4_ray.dataops.windows import tumbling_window

    out = tumbling_window(_events(), "user_id", "ts", "value", window_s=3600).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("window_start_s")
    assert list(u1["n_events"]) == [3, 2]
    assert list(u1["sum_value_cents"]) == [300, 200]
    u2 = out[out["user_id"] == 2]
    assert list(u2["sum_value_cents"]) == [250]


def test_sliding_window(ray_session):
    from yago4_ray.dataops.windows import sliding_window

    out = sliding_window(
        _events(), "user_id", "ts", "value", window_s=120, slide_s=60
    ).to_pandas()
    # slide-aligned windows covering events at t=0,60,120 (size 120,
    # slide 60): [t-60,t+60)={0}, [t0,+120)={0,60}, [+60,+180)={60,120},
    # [+120,+240)={120}
    u1 = out[out["user_id"] == 1].sort_values("window_start_s")
    assert list(u1["n_events"])[:4] == [1, 2, 2, 1]


def test_asof_join(ray_session):
    from yago4_ray.dataops.temporal import asof_join

    left = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 2, 3],
        "t": [10, 25, 5, 7],
        "payload": ["a", "b", "c", "d"],
    }))
    right = ray.data.from_pandas(pd.DataFrame({
        "k": [1, 1, 2],
        "t": [8, 20, 9],
        "tag": ["r1", "r2", "r3"],
    }))
    out = asof_join(
        left, right, by="k", on="t",
        left_columns=["payload"], right_columns=["tag"],
    ).to_pandas().sort_values(["k", "t"]).reset_index(drop=True)
    # k=1 t=10 → r1 (t=8); k=1 t=25 → r2 (t=20); k=2 t=5 → none; k=3 → none
    assert list(out["payload"]) == ["a", "b", "c", "d"]
    assert list(out["tag_right"].fillna("-")) == ["r1", "r2", "-", "-"]
