"""Deterministic kiln-shaped fixture tables (FIXTURES.md schemas, seed 42).

Small-scale synthetic data matching the reference's table SHAPES (grain,
columns, frequencies, value ranges — FIXTURES.md / SURVEY.md §1.1) so the
pipeline's alignment, gap-fill, window, and labeling semantics can be
golden-tested. This is NOT the reference's generator: values are simple
seeded draws, only the schema/grain/range contracts are reproduced.

Injected per FIXTURES.md: duplicate timestamps (dedup A1), a maintenance
gap (ffill R2 / interpolate R3), one accretion event with a known
[start, critical) window (J3 boundaries), and a NaN run longer than the
24 h rolling window (min_periods semantics W2/W5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

SEED = 42
N_DAYS = 60
START = pd.Timestamp("2024-06-01")

POSITIONS = [f"P{i:02d}" for i in range(1, 23)]
FANS = [f"SAF{i:02d}" for i in range(2, 10)] + ["CB"]
ZONES_QRT = list(range(2, 11))
N_ZONES = 11

# one event with known boundaries for J3 golden tests
EVENT = {
    "EVENT_ID": 1,
    "START_DATE": START + pd.Timedelta(days=20),
    "CRITICAL_DATE": START + pd.Timedelta(days=35),
    "CLEARED_DATE": START + pd.Timedelta(days=40),
    "ZONE": 5,
    "DURATION_DAYS": 20,
}

MAINT_START = START + pd.Timedelta(days=10)
MAINT_END = START + pd.Timedelta(days=12)


def _rng() -> np.random.Generator:
    return np.random.default_rng(SEED)


def mis_report(n_days: int = N_DAYS) -> pd.DataFrame:
    rng = _rng()
    N_DAYS = n_days
    dates = pd.date_range(START, periods=N_DAYS, freq="D")
    eff = rng.uniform(0.5, 1.0, N_DAYS)
    prod = 2000.0 * eff
    df = pd.DataFrame({
        "DATE": dates,
        "CAMP_DAY": np.arange(1, N_DAYS + 1, dtype=np.int32),
        "PRODUCTION ACTUAL": prod,
        "GRADE_A": prod * rng.uniform(0.6, 0.8, N_DAYS),
        "GRADE_B": prod * rng.uniform(0.1, 0.2, N_DAYS),
        "DRI_FINES": prod * rng.uniform(0.02, 0.08, N_DAYS),
        "DRI_DUST": prod * rng.uniform(0.01, 0.04, N_DAYS),
        "PRODUCTION PLAN": np.full(N_DAYS, 2000.0),
        "PROD_LOSS": rng.uniform(0, 100, N_DAYS),
        "PELLETS_CONSUMPTION": 500 + rng.uniform(-50, 50, N_DAYS),
        "IRON ORE CONSUMPTION": 1000 + rng.uniform(-100, 100, N_DAYS),
        "TOTAL_IRON_ORE_PELLETS": 1500 + rng.uniform(-150, 150, N_DAYS),
        "HG_COAL_CONSUMPTION": 800 + rng.uniform(-80, 80, N_DAYS),
        "SA_COAL_CONSUMPTION": 400 + rng.uniform(-40, 40, N_DAYS),
        "ESSAR_FINES": 50 + rng.uniform(-5, 5, N_DAYS),
        "NCL_FINES": 70 + rng.uniform(-7, 7, N_DAYS),
        "WASH_COAL": 250 + rng.uniform(-25, 25, N_DAYS),
        "COAL_LOSSES_BYPRODUCTS": rng.uniform(10, 50, N_DAYS),
        "GROSS COAL CONSUMPTION": 1500 + rng.uniform(-100, 100, N_DAYS),
        "COAL_PER_TDRI": rng.uniform(0.7, 0.9, N_DAYS),
        "DOLO_CONSUMPTION": 30 + rng.uniform(-3, 3, N_DAYS),
        "CHAR_GENERATION": 150 + rng.uniform(-15, 15, N_DAYS),
        "PLUS_6_CHAR": 60 + rng.uniform(-6, 6, N_DAYS),
        "MINUS_6_CHAR": 50 + rng.uniform(-5, 5, N_DAYS),
        "MAG_CHAR": 20 + rng.uniform(-2, 2, N_DAYS),
        "MIX_CHAR": 20 + rng.uniform(-2, 2, N_DAYS),
        "POWER": rng.uniform(800, 950, N_DAYS),
        "KILN_AVAILABILITY": rng.uniform(80, 100, N_DAYS),
        "TOTAL_STEAM_FLOW": rng.uniform(25, 30, N_DAYS),
        "AVERAGE_STEAM": rng.uniform(25, 30, N_DAYS),
        "FEED_LOSS_TOTAL": rng.integers(0, 180, N_DAYS).astype(float),
        "SLINGER_LOSS": rng.integers(0, 120, N_DAYS).astype(float),
        "FEED_LOSS_REASON": rng.choice(["NONE", "JAM", "BREAKDOWN"], N_DAYS),
        "SLINGER_LOSS_REASON": rng.choice(["NONE", "TRIP"], N_DAYS),
        "REMARKS": rng.choice(["OK", "CHECK", ""], N_DAYS),
    })
    maint = (df["DATE"] >= MAINT_START) & (df["DATE"] < MAINT_END)
    df.loc[maint, ["PRODUCTION ACTUAL", "PRODUCTION PLAN"]] = 0.0
    df.loc[maint, "POWER"] = 150.0
    return df


def shell_temperature(n_days: int = N_DAYS) -> pd.DataFrame:
    rng = _rng()
    dates = pd.date_range(START, periods=n_days, freq="D")
    rows = []
    for d in dates:
        for p in POSITIONS:
            base = rng.uniform(100, 400)
            angles = base + rng.normal(0, 10, 4)
            rows.append((d, p, *angles, angles.mean()))
    df = pd.DataFrame(rows, columns=["DATE", "POSITION", "SHELL_TEMP_0",
                                     "SHELL_TEMP_90", "SHELL_TEMP_180",
                                     "SHELL_TEMP_270", "SHELL_TEMP_AVG"])
    # inject duplicate-timestamp rows (A1 dedup)
    return pd.concat([df, df.iloc[:5]], ignore_index=True)


def air_calibration(n_days: int = N_DAYS) -> pd.DataFrame:
    rng = _rng()
    dates = pd.date_range(START, periods=n_days, freq="D")
    rows = []
    for d in dates:
        for f in FANS:
            rows.append((d, f, rng.uniform(70, 90), rng.uniform(18, 25),
                         55000 + rng.uniform(-5000, 5000)))
    return pd.DataFrame(rows, columns=["DATE", "FAN", "DAMPER",
                                       "VELOCITY", "AIR_FLOW"])


def qrt_temperature(n_days: int = N_DAYS) -> pd.DataFrame:
    rng = _rng()
    times = pd.date_range(START, periods=n_days * 12, freq="2h")
    rows = []
    for t in times:
        if MAINT_START <= t < MAINT_END:
            continue  # maintenance gap → exercises interpolation
        for z in ZONES_QRT:
            rows.append((t, z, rng.uniform(650, 1200)))
    return pd.DataFrame(rows, columns=["DATETIME", "ZONE", "TEMPERATURE"])


def zone_temperature(freq: str = "10min", n_days: int = N_DAYS) -> pd.DataFrame:
    """Wide 2-min (default thinned to 10-min for test speed) zone temps.

    During the fixture event, the event zone cools by up to 200 °C —
    giving the anomaly detector (W11) a known drop to find.
    """
    rng = _rng()
    step_min = pd.Timedelta(freq).total_seconds() / 60.0
    times = pd.date_range(START, periods=int(n_days * 24 * 60 / step_min), freq=freq)
    df = pd.DataFrame({"DATETIME": times})
    t_arr = np.arange(len(times))
    for z in range(N_ZONES):
        base = rng.uniform(750, 925)
        vals = base + 10 * np.sin(t_arr / 50.0 + z) + rng.normal(0, 3, len(times))
        in_event = ((times >= EVENT["START_DATE"]) & (times < EVENT["CRITICAL_DATE"])
                    & (z == EVENT["ZONE"]))
        frac = np.clip(
            (times - EVENT["START_DATE"]) / (EVENT["CRITICAL_DATE"] - EVENT["START_DATE"]),
            0, 1).astype(float)
        vals = np.where(in_event, vals - 200.0 * frac, vals)
        maint = (times >= MAINT_START) & (times < MAINT_END)
        vals = np.where(maint, rng.uniform(100, 200), vals)
        df[f"ZONE_{z}"] = vals
    # NaN run longer than the 24 h rolling window (W2/W5 min_periods)
    nan_start = START + pd.Timedelta(days=50)
    nan_end = nan_start + pd.Timedelta(hours=30)
    df.loc[(df["DATETIME"] >= nan_start) & (df["DATETIME"] < nan_end), "ZONE_3"] = np.nan
    return df


def accretion_events() -> pd.DataFrame:
    return pd.DataFrame([EVENT])


def accretion_truth(n_days: int = N_DAYS) -> pd.DataFrame:
    dates = pd.date_range(START, periods=n_days, freq="D")
    has = (dates >= EVENT["START_DATE"].normalize()) & \
          (dates < EVENT["CLEARED_DATE"].normalize())
    return pd.DataFrame({
        "DATE": dates,
        "HAS_ACCRETION": has,
        "ACTIVE_ACCRETION_COUNT": has.astype(int),
        "ZONES_AFFECTED": np.where(has, str(EVENT["ZONE"]), ""),
        "MAX_SEVERITY": np.where(
            has,
            np.clip((dates - EVENT["START_DATE"]) /
                    (EVENT["CRITICAL_DATE"] - EVENT["START_DATE"]), 0, 1), 0.0),
    })


def all_tables(n_days: int = N_DAYS,
               zone_freq: str = "10min") -> dict[str, pd.DataFrame]:
    return {
        "mis_report": mis_report(n_days),
        "shell_temperature": shell_temperature(n_days),
        "air_calibration": air_calibration(n_days),
        "qrt_temperature": qrt_temperature(n_days),
        "zone_temperature": zone_temperature(zone_freq, n_days),
        "accretion_events": accretion_events(),
        "accretion_truth": accretion_truth(n_days),
    }
