"""Calendar/Julian date utilities (reference `asset_asrl/Astro/Date.py`)."""

import datetime as _dt

J2000_JD = 2451545.0


def date_to_jd(year, month, day, hour=0, minute=0, second=0.0):
    """Gregorian calendar date -> Julian date (standard algorithm)."""
    if month <= 2:
        year -= 1
        month += 12
    A = year // 100
    B = 2 - A + A // 4
    jd = (int(365.25 * (year + 4716)) + int(30.6001 * (month + 1))
          + day + B - 1524.5)
    return jd + (hour + minute / 60.0 + second / 3600.0) / 24.0


def jd_to_date(jd):
    jd = jd + 0.5
    Z = int(jd)
    F = jd - Z
    A = Z
    if Z >= 2299161:
        alpha = int((Z - 1867216.25) / 36524.25)
        A = Z + 1 + alpha - alpha // 4
    B = A + 1524
    C = int((B - 122.1) / 365.25)
    D = int(365.25 * C)
    E = int((B - D) / 30.6001)
    day = B - D - int(30.6001 * E) + F
    month = E - 1 if E < 14 else E - 13
    year = C - 4716 if month > 2 else C - 4715
    return year, month, day


def jd_to_j2000s(jd):
    """Julian date -> seconds past J2000 (SPICE ephemeris-time style)."""
    return (jd - J2000_JD) * 86400.0


def j2000s_to_jd(et):
    return et / 86400.0 + J2000_JD


def datetime_to_jd(dt: _dt.datetime):
    return date_to_jd(dt.year, dt.month, dt.day, dt.hour, dt.minute,
                      dt.second + dt.microsecond * 1e-6)
