"""Minimal map-projection engine for ST_Transform — SURVEY.md §2.A.3.

The reference supports arbitrary SRID pairs through proj4rs with a cached
per-pair transformer (``spatial/src/function/st_transform.rs:18-120``,
``ProjCache``).  This module is the Spark-side equivalent: the classic
proj4 projection formulas (Snyder, "Map Projections — A Working Manual",
USGS PP 1395; same algorithm structure as PROJ's lcc/tmerc/merc/aea
modules) implemented over an embedded parameter table of common EPSG codes
plus the three formulaic UTM families.

Scope / fidelity notes:
* The proj4 datum pipeline is reproduced: when source and destination
  ellipsoids differ, coordinates round-trip through geocentric XYZ
  (geodetic→geocentric on the source ellipsoid, iterative
  geocentric→geodetic on the destination) — byte-exact against the
  reference's proj4rs output for the slt corpus (4326→3587).  All towgs84
  parameters in the embedded table are zero (modern datums), so only the
  ellipsoid change matters; NAD27/OSGB36 results are projection-exact but
  grid-shift-free.  Web mercator (3857) skips datum transformation
  entirely (the proj ``+nadgrids=@null`` convention).
* All math is double precision following PROJ's operation order, so
  round-trips are stable to ~1e-9 degrees.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, Optional

_HALFPI = math.pi / 2.0
_EPS10 = 1.0e-10

# ellipsoid name -> (semi-major a, inverse flattening rf; rf=0 => sphere)
ELLPS = {
    "GRS80": (6378137.0, 298.257222101),
    "WGS84": (6378137.0, 298.257223563),
    "airy": (6377563.396, 299.3249646),
    "clrk66": (6378206.4, 294.978698214),
    "intl": (6378388.0, 297.0),
    "bessel": (6377397.155, 299.1528128),
    "sphere": (6378137.0, 0.0),
}


def _msfn(sinphi: float, cosphi: float, es: float) -> float:
    return cosphi / math.sqrt(1.0 - es * sinphi * sinphi)


def _tsfn(phi: float, sinphi: float, e: float) -> float:
    sinphi *= e
    return math.tan(0.5 * (_HALFPI - phi)) / math.pow(
        (1.0 - sinphi) / (1.0 + sinphi), 0.5 * e
    )


def _phi2(ts: float, e: float) -> float:
    """Inverse of _tsfn by fixed-point iteration (PROJ pj_phi2)."""
    eccnth = 0.5 * e
    phi = _HALFPI - 2.0 * math.atan(ts)
    for _ in range(15):
        con = e * math.sin(phi)
        dphi = (
            _HALFPI
            - 2.0 * math.atan(ts * math.pow((1.0 - con) / (1.0 + con), eccnth))
            - phi
        )
        phi += dphi
        if abs(dphi) < 1.0e-12:
            break
    return phi


def _qsfn(sinphi: float, e: float, one_es: float) -> float:
    if e >= 1.0e-7:
        con = e * sinphi
        return one_es * (
            sinphi / (1.0 - con * con) - (0.5 / e) * math.log((1.0 - con) / (1.0 + con))
        )
    return sinphi + sinphi


# meridian arc series coefficients (PROJ pj_enfn / pj_mlfn)
_C00, _C02, _C04, _C06, _C08 = 1.0, 0.25, 0.046875, 0.01953125, 0.01068115234375
_C22 = 0.75
_C44, _C46, _C48 = 0.46875, 0.01302083333333333333, 0.00712076822916666666
_C66, _C68 = 0.36458333333333333333, 0.00569661458333333333
_C88 = 0.3076171875


def _enfn(es: float) -> tuple:
    en0 = _C00 - es * (_C02 + es * (_C04 + es * (_C06 + es * _C08)))
    en1 = es * (_C22 - es * (_C04 + es * (_C06 + es * _C08)))
    t = es * es
    en2 = t * (_C44 - es * (_C46 + es * _C48))
    t *= es
    en3 = t * (_C66 - es * _C68)
    en4 = t * es * _C88
    return (en0, en1, en2, en3, en4)


def _mlfn(phi: float, sphi: float, cphi: float, en: tuple) -> float:
    cphi *= sphi
    sphi *= sphi
    return en[0] * phi - cphi * (en[1] + sphi * (en[2] + sphi * (en[3] + sphi * en[4])))


def _inv_mlfn(arg: float, es: float, en: tuple) -> float:
    k = 1.0 / (1.0 - es)
    phi = arg
    for _ in range(10):
        s = math.sin(phi)
        t = 1.0 - es * s * s
        t = (_mlfn(phi, s, math.cos(phi), en) - arg) * (t * math.sqrt(t)) * k
        phi -= t
        if abs(t) < 1.0e-11:
            break
    return phi


class _Projection:
    """Base: fwd/inv between absolute-radian (lam, phi) and meters (x, y)."""

    def __init__(self, p: dict):
        a, rf = ELLPS[p.get("ellps", "WGS84")]
        # datum identity for the geocentric pipeline: the def's ellipsoid,
        # or None for +nadgrids=@null CRSs (web mercator) that never shift
        ef = 0.0 if rf == 0 else 1.0 / rf
        self.datum = None if p.get("datum_none") else (a, 2.0 * ef - ef * ef)
        self.a = p.get("a", a)
        f = 0.0 if rf == 0 else 1.0 / rf
        if "sphere_a" in p:  # spherical variant on given radius
            self.a = p["sphere_a"]
            f = 0.0
        self.es = 2.0 * f - f * f
        self.e = math.sqrt(self.es)
        self.one_es = 1.0 - self.es
        self.lam0 = math.radians(p.get("lon_0", 0.0))
        self.phi0 = math.radians(p.get("lat_0", 0.0))
        self.x0 = p.get("x_0", 0.0)
        self.y0 = p.get("y_0", 0.0)
        self.k0 = p.get("k_0", 1.0)
        self._setup(p)

    def _setup(self, p: dict) -> None:  # pragma: no cover - abstract
        pass

    def fwd(self, lam: float, phi: float) -> tuple:
        x, y = self._fwd(lam - self.lam0, phi)
        return self.a * x + self.x0, self.a * y + self.y0

    def inv(self, x: float, y: float) -> tuple:
        lam, phi = self._inv((x - self.x0) / self.a, (y - self.y0) / self.a)
        return lam + self.lam0, phi


class _LongLat(_Projection):
    def fwd(self, lam: float, phi: float) -> tuple:  # degrees out
        return math.degrees(lam), math.degrees(phi)

    def inv(self, x: float, y: float) -> tuple:  # degrees in
        return math.radians(x), math.radians(y)


class _Merc(_Projection):
    """Mercator; spherical when es==0 (web mercator 3857), else ellipsoidal."""

    def _fwd(self, lam: float, phi: float) -> tuple:
        if self.es == 0.0:
            return self.k0 * lam, self.k0 * math.log(math.tan(math.pi / 4.0 + 0.5 * phi))
        return self.k0 * lam, -self.k0 * math.log(_tsfn(phi, math.sin(phi), self.e))

    def _inv(self, x: float, y: float) -> tuple:
        if self.es == 0.0:
            return x / self.k0, 2.0 * math.atan(math.exp(y / self.k0)) - _HALFPI
        return x / self.k0, _phi2(math.exp(-y / self.k0), self.e)


class _Lcc(_Projection):
    """Lambert Conformal Conic 1/2SP (PROJ lcc.cpp operation order)."""

    def _setup(self, p: dict) -> None:
        phi1 = math.radians(p["lat_1"])
        phi2 = math.radians(p.get("lat_2", p["lat_1"]))
        sinphi = math.sin(phi1)
        cosphi = math.cos(phi1)
        secant = abs(phi1 - phi2) >= _EPS10
        m1 = _msfn(sinphi, cosphi, self.es)
        ml1 = _tsfn(phi1, sinphi, self.e)
        if secant:
            sinphi2 = math.sin(phi2)
            self.n = math.log(m1 / _msfn(sinphi2, math.cos(phi2), self.es))
            self.n /= math.log(ml1 / _tsfn(phi2, sinphi2, self.e))
        else:
            self.n = sinphi
        self.c = m1 * math.pow(ml1, -self.n) / self.n
        if abs(abs(self.phi0) - _HALFPI) < _EPS10:
            self.rho0 = 0.0
        else:
            self.rho0 = self.c * math.pow(
                _tsfn(self.phi0, math.sin(self.phi0), self.e), self.n
            )

    def _fwd(self, lam: float, phi: float) -> tuple:
        if abs(abs(phi) - _HALFPI) < _EPS10:
            rho = 0.0
        else:
            rho = self.c * math.pow(_tsfn(phi, math.sin(phi), self.e), self.n)
        gamma = lam * self.n
        return (
            self.k0 * (rho * math.sin(gamma)),
            self.k0 * (self.rho0 - rho * math.cos(gamma)),
        )

    def _inv(self, x: float, y: float) -> tuple:
        x /= self.k0
        y /= self.k0
        y = self.rho0 - y
        rho = math.hypot(x, y)
        if rho != 0.0:
            if self.n < 0.0:
                rho = -rho
                x = -x
                y = -y
            phi = _phi2(math.pow(rho / self.c, 1.0 / self.n), self.e)
            lam = math.atan2(x, y) / self.n
        else:
            lam = 0.0
            phi = _HALFPI if self.n > 0.0 else -_HALFPI
        return lam, phi


_FC1, _FC2, _FC3, _FC4 = 1.0, 0.5, 0.16666666666666666666, 0.08333333333333333333
_FC5, _FC6 = 0.05, 0.03333333333333333333
_FC7, _FC8 = 0.03571428571428571428, 0.03125


class _Tmerc(_Projection):
    """Transverse Mercator, classic Evenden/Snyder series (PROJ approx)."""

    def _setup(self, p: dict) -> None:
        self.en = _enfn(self.es)
        self.ml0 = _mlfn(self.phi0, math.sin(self.phi0), math.cos(self.phi0), self.en)
        self.esp = self.es / (1.0 - self.es)

    def _fwd(self, lam: float, phi: float) -> tuple:
        sinphi = math.sin(phi)
        cosphi = math.cos(phi)
        t = sinphi / cosphi if abs(cosphi) > 1.0e-10 else 0.0
        t *= t
        al = cosphi * lam
        als = al * al
        al /= math.sqrt(1.0 - self.es * sinphi * sinphi)
        n = self.esp * cosphi * cosphi
        x = self.k0 * al * (
            _FC1
            + _FC3
            * als
            * (
                1.0
                - t
                + n
                + _FC5
                * als
                * (
                    5.0
                    + t * (t - 18.0)
                    + n * (14.0 - 58.0 * t)
                    + _FC7 * als * (61.0 + t * (t * (179.0 - t) - 479.0))
                )
            )
        )
        y = self.k0 * (
            _mlfn(phi, sinphi, cosphi, self.en)
            - self.ml0
            + sinphi
            * al
            * lam
            * _FC2
            * (
                1.0
                + _FC4
                * als
                * (
                    5.0
                    - t
                    + n * (9.0 + 4.0 * n)
                    + _FC6
                    * als
                    * (
                        61.0
                        + t * (t - 58.0)
                        + n * (270.0 - 330.0 * t)
                        + _FC8 * als * (1385.0 + t * (t * (543.0 - t) - 3111.0))
                    )
                )
            )
        )
        return x, y

    def _inv(self, x: float, y: float) -> tuple:
        phi = _inv_mlfn(self.ml0 + y / self.k0, self.es, self.en)
        if abs(phi) >= _HALFPI:
            return 0.0, _HALFPI if y >= 0.0 else -_HALFPI
        sinphi = math.sin(phi)
        cosphi = math.cos(phi)
        t = sinphi / cosphi if abs(cosphi) > 1.0e-10 else 0.0
        n = self.esp * cosphi * cosphi
        con = 1.0 - self.es * sinphi * sinphi
        d = x * math.sqrt(con) / self.k0
        con *= t
        t *= t
        ds = d * d
        phi -= (con * ds / (1.0 - self.es)) * _FC2 * (
            1.0
            - ds
            * _FC4
            * (
                5.0
                + t * (3.0 - 9.0 * n)
                + n * (1.0 - 4.0 * n)
                - ds
                * _FC6
                * (
                    61.0
                    + t * (90.0 - 252.0 * n + 45.0 * t)
                    + 46.0 * n
                    - ds * _FC8 * (1385.0 + t * (3633.0 + t * (4095.0 + 1574.0 * t)))
                )
            )
        )
        lam = d * (
            _FC1
            - ds
            * _FC3
            * (
                1.0
                + 2.0 * t
                + n
                - ds
                * _FC5
                * (
                    5.0
                    + t * (28.0 + 24.0 * t + 8.0 * n)
                    + 6.0 * n
                    - ds * _FC7 * (61.0 + t * (662.0 + t * (1320.0 + 720.0 * t)))
                )
            )
        ) / cosphi
        return lam, phi


class _Aea(_Projection):
    """Albers Equal Area (PROJ aea.cpp)."""

    def _setup(self, p: dict) -> None:
        phi1 = math.radians(p["lat_1"])
        phi2 = math.radians(p["lat_2"])
        sinphi = math.sin(phi1)
        m1 = _msfn(sinphi, math.cos(phi1), self.es)
        q1 = _qsfn(sinphi, self.e, self.one_es)
        sinphi2 = math.sin(phi2)
        m2 = _msfn(sinphi2, math.cos(phi2), self.es)
        q2 = _qsfn(sinphi2, self.e, self.one_es)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.c = m1 * m1 + self.n * q1
        self.rho0 = (
            math.sqrt(self.c - self.n * _qsfn(math.sin(self.phi0), self.e, self.one_es))
            / self.n
        )

    def _fwd(self, lam: float, phi: float) -> tuple:
        rho = self.c - self.n * _qsfn(math.sin(phi), self.e, self.one_es)
        if rho < 0.0:
            rho = 0.0
        rho = math.sqrt(rho) / self.n
        gamma = lam * self.n
        return rho * math.sin(gamma), self.rho0 - rho * math.cos(gamma)

    def _inv(self, x: float, y: float) -> tuple:
        y = self.rho0 - y
        rho = math.hypot(x, y)
        if rho == 0.0:
            return 0.0, _HALFPI if self.n > 0.0 else -_HALFPI
        if self.n < 0.0:
            rho = -rho
            x = -x
            y = -y
        q = (self.c - rho * rho * self.n * self.n) / self.n
        # inverse of qsfn by Newton iteration (PROJ phi1_)
        phi = math.asin(max(-1.0, min(1.0, 0.5 * q)))
        if self.e >= 1.0e-7:
            tol = 1.0e-10
            for _ in range(15):
                sinphi = math.sin(phi)
                cosphi = math.cos(phi)
                con = self.e * sinphi
                com = 1.0 - con * con
                dphi = (
                    0.5
                    * com
                    * com
                    / cosphi
                    * (
                        q / self.one_es
                        - sinphi / com
                        + 0.5 / self.e * math.log((1.0 - con) / (1.0 + con))
                    )
                )
                phi += dphi
                if abs(dphi) <= tol:
                    break
        return math.atan2(x, y) / self.n, phi


_FAMILIES = {
    "longlat": _LongLat,
    "merc": _Merc,
    "lcc": _Lcc,
    "tmerc": _Tmerc,
    "aea": _Aea,
}

# Curated EPSG parameter table (values from the public EPSG registry /
# proj4 definition strings).  UTM families are generated below.
EPSG_DEFS: dict[int, dict] = {
    # geographic
    4326: {"proj": "longlat", "ellps": "WGS84"},
    4258: {"proj": "longlat", "ellps": "GRS80"},   # ETRS89
    4269: {"proj": "longlat", "ellps": "GRS80"},   # NAD83
    4267: {"proj": "longlat", "ellps": "clrk66"},  # NAD27 (no datum shift)
    4277: {"proj": "longlat", "ellps": "airy"},    # OSGB36 (no datum shift)
    # mercator
    3857: {"proj": "merc", "sphere_a": 6378137.0, "datum_none": True},
    900913: {"proj": "merc", "sphere_a": 6378137.0, "datum_none": True},
    3395: {"proj": "merc", "ellps": "WGS84"},       # world mercator
    # Lambert conformal conic
    3587: {  # NAD83(NSRS2007) / Michigan Central — the slt L312 code
        "proj": "lcc", "ellps": "GRS80",
        "lat_1": 45.7, "lat_2": 44.18333333333333,
        "lat_0": 43.31666666666667, "lon_0": -84.36666666666666,
        "x_0": 6000000.0, "y_0": 0.0,
    },
    2154: {  # RGF93 / Lambert-93 (France)
        "proj": "lcc", "ellps": "GRS80",
        "lat_1": 49.0, "lat_2": 44.0, "lat_0": 46.5, "lon_0": 3.0,
        "x_0": 700000.0, "y_0": 6600000.0,
    },
    102004: {  # USA Contiguous LCC (Esri)
        "proj": "lcc", "ellps": "GRS80",
        "lat_1": 33.0, "lat_2": 45.0, "lat_0": 39.0, "lon_0": -96.0,
        "x_0": 0.0, "y_0": 0.0,
    },
    # transverse mercator
    27700: {  # OSGB36 / British National Grid (projection-exact)
        "proj": "tmerc", "ellps": "airy",
        "lat_0": 49.0, "lon_0": -2.0, "k_0": 0.9996012717,
        "x_0": 400000.0, "y_0": -100000.0,
    },
    # Albers
    5070: {  # NAD83 / Conus Albers
        "proj": "aea", "ellps": "GRS80",
        "lat_1": 29.5, "lat_2": 45.5, "lat_0": 23.0, "lon_0": -96.0,
        "x_0": 0.0, "y_0": 0.0,
    },
}


def _utm(zone: int, ellps: str, south: bool = False) -> dict:
    return {
        "proj": "tmerc", "ellps": ellps,
        "lat_0": 0.0, "lon_0": -183.0 + 6.0 * zone, "k_0": 0.9996,
        "x_0": 500000.0, "y_0": 10000000.0 if south else 0.0,
    }


for _z in range(1, 61):
    EPSG_DEFS[32600 + _z] = _utm(_z, "WGS84")          # WGS84 UTM north
    EPSG_DEFS[32700 + _z] = _utm(_z, "WGS84", True)    # WGS84 UTM south
for _z in range(28, 39):
    EPSG_DEFS[25800 + _z] = _utm(_z, "GRS80")          # ETRS89 UTM (258xx)
for _z in range(1, 24):
    EPSG_DEFS[26900 + _z] = _utm(_z, "GRS80")          # NAD83 UTM


@lru_cache(maxsize=256)
def _projection(srid: int) -> Optional[_Projection]:
    p = EPSG_DEFS.get(srid)
    if p is None:
        return None
    return _FAMILIES[p["proj"]](p)


def _datum_shift(lam: float, phi: float, src: tuple, dst: tuple) -> tuple:
    """Geocentric round-trip between two (a, es) ellipsoids, zero offsets.

    Matches the proj4 datum pipeline (geocent.c): geodetic→geocentric at
    h=0 on the source ellipsoid, then iterative geocentric→geodetic on the
    destination.  With all-zero towgs84 this is still not the identity when
    the ellipsoids differ (e.g. WGS84 vs GRS80 flattening) — reproducing it
    is what makes the slt 4326→3587 golden byte-exact.
    """
    a1, es1 = src
    a2, es2 = dst
    s, c = math.sin(phi), math.cos(phi)
    rn = a1 / math.sqrt(1.0 - es1 * s * s)
    x = rn * c * math.cos(lam)
    y = rn * c * math.sin(lam)
    z = rn * (1.0 - es1) * s
    p = math.hypot(x, y)
    phi2 = math.atan2(z, p * (1.0 - es2))
    for _ in range(10):
        s2 = math.sin(phi2)
        rn2 = a2 / math.sqrt(1.0 - es2 * s2 * s2)
        nxt = math.atan2(z + es2 * rn2 * s2, p)
        if abs(nxt - phi2) < 1.0e-18:
            phi2 = nxt
            break
        phi2 = nxt
    return math.atan2(y, x), phi2


@lru_cache(maxsize=256)
def get_transformer(src: int, dst: int) -> Optional[Callable[[float, float], tuple]]:
    """(x, y) -> (x, y) coordinate transformer, cached per SRID pair
    (mirrors the reference's ``ProjCache``, st_transform.rs:18-120).
    Returns None when either SRID is outside the embedded table."""
    sp = _projection(src)
    dp = _projection(dst)
    if sp is None or dp is None:
        return None
    if src == dst:
        return lambda x, y: (x, y)
    shift = (
        sp.datum is not None and dp.datum is not None and sp.datum != dp.datum
    )

    def tx(x: float, y: float) -> tuple:
        lam, phi = sp.inv(x, y)
        if shift:
            lam, phi = _datum_shift(lam, phi, sp.datum, dp.datum)
        return dp.fwd(lam, phi)

    return tx
