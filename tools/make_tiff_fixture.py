#!/usr/bin/env python3
"""Generate minimal GeoTIFF fixtures for the graft raster-area reader.

Writes little-endian TIFF 6.0 + GeoTIFF 1.1 bytes directly with `struct`
(public specs; same independent-writer discipline as make_nc_fixture.py —
the Scala reader in graft/sources/GeoTiff.scala is written from the spec,
not from this code). Pixel payloads are zero strips: the reader under
test only consumes georeferencing, like the reference's
get_area_def_from_raster consumes only the rasterio/GDAL handle metadata.

Usage: make_tiff_fixture.py <outdir>
"""
import struct, sys, os

T_SHORT, T_LONG, T_DOUBLE = 3, 4, 12


def write_tiff(path, width, height, pixel_scale, tiepoint, geokeys, geodoubles):
    """geokeys: list of (keyId, tagLocation, count, value) — caller encodes
    doubles via tagLocation=34736 + index into geodoubles."""
    entries = []      # (tag, type, count, packed-inline-or-None, outline-bytes)
    outline = []      # deferred byte blobs, patched with offsets later

    def entry(tag, typ, values):
        size = {T_SHORT: 2, T_LONG: 4, T_DOUBLE: 8}[typ]
        fmt = {T_SHORT: 'H', T_LONG: 'I', T_DOUBLE: 'd'}[typ]
        raw = struct.pack('<%d%s' % (len(values), fmt), *values)
        if len(raw) <= 4:
            entries.append((tag, typ, len(values), raw.ljust(4, b'\x00'), None))
        else:
            entries.append((tag, typ, len(values), None, raw))

    strip = b'\x00' * (width * height)
    entry(256, T_LONG, [width])          # ImageWidth
    entry(257, T_LONG, [height])         # ImageLength
    entry(258, T_SHORT, [8])             # BitsPerSample
    entry(259, T_SHORT, [1])             # Compression: none
    entry(262, T_SHORT, [1])             # Photometric: BlackIsZero
    entry(273, T_LONG, [0])              # StripOffsets (patched below)
    entry(277, T_SHORT, [1])             # SamplesPerPixel
    entry(278, T_LONG, [height])         # RowsPerStrip
    entry(279, T_LONG, [len(strip)])     # StripByteCounts
    entry(33550, T_DOUBLE, list(pixel_scale) + [0.0])   # ModelPixelScale
    entry(33922, T_DOUBLE, list(tiepoint))              # ModelTiepoint
    gk = [1, 1, 0, len(geokeys)]
    for (kid, loc, cnt, val) in geokeys:
        gk += [kid, loc, cnt, val]
    entry(34735, T_SHORT, gk)            # GeoKeyDirectory
    if geodoubles:
        entry(34736, T_DOUBLE, list(geodoubles))  # GeoDoubleParams

    entries.sort(key=lambda e: e[0])
    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n + 4  # after entry count, entries, next-IFD ptr
    # lay out out-of-line values then the strip
    blobs = []
    off = data_off
    for i, (tag, typ, cnt, inline, raw) in enumerate(entries):
        if raw is not None:
            if off % 2:
                blobs.append(b'\x00'); off += 1
            blobs.append(raw)
            entries[i] = (tag, typ, cnt, struct.pack('<I', off), None)
            off += len(raw)
    strip_off = off
    entries = [(t, ty, c, struct.pack('<I', strip_off) if t == 273 else v, None)
               for (t, ty, c, v, _) in entries]

    with open(path, 'wb') as f:
        f.write(b'II' + struct.pack('<HI', 42, ifd_off))
        f.write(struct.pack('<H', n))
        for (tag, typ, cnt, val, _) in entries:
            f.write(struct.pack('<HHI', tag, typ, cnt) + val)
        f.write(struct.pack('<I', 0))  # no next IFD
        for b in blobs:
            f.write(b)
        f.write(strip)
    print(f"{path}: {os.path.getsize(path)} bytes, {width}x{height}")


def psn(outdir):
    """User-defined north-polar stereographic on the Hughes ellipsoid
    (the nh10km grid parameters), 76x112 @ 100km pixels."""
    doubles = [70.0, -45.0, 6378273.0, 6356889.44891]
    geokeys = [
        (1024, 0, 1, 1),        # GTModelType = projected
        (3072, 0, 1, 32767),    # ProjectedCSType = user-defined
        (3075, 0, 1, 15),       # ProjCoordTrans = CT_PolarStereographic
        (3078, 34736, 1, 0),    # ProjStdParallel1 -> doubles[0]
        (3095, 34736, 1, 1),    # ProjStraightVertPoleLong -> doubles[1]
        (2048, 0, 1, 32767),    # GeographicType = user-defined
        (2057, 34736, 1, 2),    # GeogSemiMajor -> doubles[2]
        (2058, 34736, 1, 3),    # GeogSemiMinor -> doubles[3]
    ]
    write_tiff(os.path.join(outdir, 'psn.tif'), 76, 112,
               (100000.0, 100000.0), [0, 0, 0, -3850000.0, 5850000.0, 0],
               geokeys, doubles)


def ll(outdir):
    """EPSG:4326 geographic, 37x19 at 10-degree pixels."""
    geokeys = [
        (1024, 0, 1, 2),     # GTModelType = geographic
        (2048, 0, 1, 4326),  # GeographicType = WGS84
    ]
    write_tiff(os.path.join(outdir, 'll.tif'), 37, 19,
               (10.0, 10.0), [0, 0, 0, -185.0, 95.0, 0], geokeys, [])


def epsg3413(outdir):
    """ProjectedCSType = EPSG:3413 (NSIDC polar stereo north), with a
    non-zero tiepoint raster index to exercise the origin back-shift."""
    geokeys = [
        (1024, 0, 1, 1),
        (3072, 0, 1, 3413),
    ]
    # tiepoint anchors raster pixel (2, 3) at model (-3800000, 5775000):
    # origin = (-3800000 - 2*25000, 5775000 + 3*25000) = (-3850000, 5850000)
    write_tiff(os.path.join(outdir, 'epsg3413.tif'), 50, 60,
               (25000.0, 25000.0), [2, 3, 0, -3800000.0, 5775000.0, 0],
               geokeys, [])


def utm33(outdir):
    """ProjectedCSType = EPSG:32633 (WGS84 / UTM zone 33N): the formulaic
    UTM family — 120x100 @ 1km pixels over southern Scandinavia."""
    geokeys = [
        (1024, 0, 1, 1),
        (3072, 0, 1, 32633),
    ]
    write_tiff(os.path.join(outdir, 'utm33.tif'), 120, 100,
               (1000.0, 1000.0), [0, 0, 0, 400000.0, 6200000.0, 0],
               geokeys, [])


def utm_user(outdir):
    """User-defined transverse Mercator equal to UTM 33N: CT=1 with the
    natural-origin + scale + false-easting keys spelled out."""
    doubles = [0.0, 15.0, 0.9996, 500000.0, 0.0, 6378137.0, 298.257223563]
    geokeys = [
        (1024, 0, 1, 1),
        (3072, 0, 1, 32767),
        (3075, 0, 1, 1),        # CT_TransverseMercator
        (3081, 34736, 1, 0),    # ProjNatOriginLat
        (3080, 34736, 1, 1),    # ProjNatOriginLong
        (3092, 34736, 1, 2),    # ProjScaleAtNatOrigin
        (3082, 34736, 1, 3),    # ProjFalseEasting
        (3083, 34736, 1, 4),    # ProjFalseNorthing
        (2048, 0, 1, 32767),
        (2057, 34736, 1, 5),    # GeogSemiMajor
        (2059, 34736, 1, 6),    # GeogInvFlattening
    ]
    write_tiff(os.path.join(outdir, 'utm_user.tif'), 120, 100,
               (1000.0, 1000.0), [0, 0, 0, 400000.0, 6200000.0, 0],
               geokeys, doubles)


def sinu_modis(outdir):
    """User-defined sinusoidal on the MODIS sphere (R=6371007.181):
    one 1200x1200 tile (h18v04-style) at 926.625433-m pixels."""
    doubles = [0.0, 6371007.181, 6371007.181]
    geokeys = [
        (1024, 0, 1, 1),
        (3072, 0, 1, 32767),
        (3075, 0, 1, 24),       # CT_Sinusoidal
        (3080, 34736, 1, 0),    # ProjNatOriginLong
        (2048, 0, 1, 32767),
        (2057, 34736, 1, 1),    # GeogSemiMajor
        (2058, 34736, 1, 2),    # GeogSemiMinor (= major: sphere)
    ]
    # MODIS tile (h=18, v=4): x0 = (18-18)*1111950.52, y0 = (9-4)*1111950.52
    write_tiff(os.path.join(outdir, 'sinu_modis.tif'), 1200, 1200,
               (926.62543305, 926.62543305), [0, 0, 0, 0.0, 5559752.598333, 0],
               geokeys, doubles)


def ease2_cea(outdir):
    """EASE-Grid 2.0 Global flavors: ProjectedCSType = EPSG:6933 (the
    baked NSIDC cea), and the user-defined CT_CylindricalEqualArea (28)
    spelling of the same CRS — both 2x downsampled 484x202 windows."""
    geokeys = [
        (1024, 0, 1, 1),
        (3072, 0, 1, 6933),
    ]
    write_tiff(os.path.join(outdir, 'ease2.tif'), 484, 202,
               (72036.0, 72036.0), [0, 0, 0, -17367530.45, 7314540.83, 0],
               geokeys, [])
    doubles = [30.0, 0.0, 6378137.0, 298.257223563]
    geokeys_user = [
        (1024, 0, 1, 1),
        (3072, 0, 1, 32767),
        (3075, 0, 1, 28),       # CT_CylindricalEqualArea
        (3078, 34736, 1, 0),    # ProjStdParallel1 (lat_ts)
        (3080, 34736, 1, 1),    # ProjNatOriginLong
        (2048, 0, 1, 32767),
        (2057, 34736, 1, 2),    # GeogSemiMajor
        (2059, 34736, 1, 3),    # GeogInvFlattening
    ]
    write_tiff(os.path.join(outdir, 'cea_user.tif'), 484, 202,
               (72036.0, 72036.0), [0, 0, 0, -17367530.45, 7314540.83, 0],
               geokeys_user, doubles)


if __name__ == '__main__':
    outdir = sys.argv[1] if len(sys.argv) > 1 else 'src/test/resources/geotiff'
    os.makedirs(outdir, exist_ok=True)
    psn(outdir)
    ll(outdir)
    epsg3413(outdir)
    utm33(outdir)
    utm_user(outdir)
    sinu_modis(outdir)
    ease2_cea(outdir)
