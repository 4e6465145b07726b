#!/usr/bin/env python3
"""Generate NetCDF3-classic test fixtures for the graft CF reader.

Writes the classic (CDF-1) and 64-bit-offset (CDF-2) formats directly
with `struct`, from the public NetCDF classic format specification
(https://docs.unidata.ucar.edu/netcdf-c/current/file_format_specifications.html)
— deliberately NOT via any NetCDF library, so the Scala reader
(graft/sources/NetCdf3.scala, written independently from the same spec)
is not tested against its own mirror image.

The fixture CONTENTS replicate the reference test datasets of
pyresample/test/test_utils/test_cf.py (_prepare_cf_nh10km, _prepare_cf_goes,
_prepare_cf_llwgs84, _prepare_cf_llnocrs, _prepare_cf_projected_packed_xy)
so the Scala specs can assert the same golden values that suite asserts.

Usage: make_nc_fixture.py <outdir>
"""
import struct, sys, os

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}
PACK = {NC_BYTE: 'b', NC_SHORT: 'h', NC_INT: 'i', NC_FLOAT: 'f', NC_DOUBLE: 'd'}


def _pad4(b):
    return b + b'\x00' * ((4 - len(b) % 4) % 4)


def _name(s):
    b = s.encode()
    return struct.pack('>i', len(b)) + _pad4(b)


def _values(nc_type, vals):
    if nc_type == NC_CHAR:
        return _pad4(vals.encode())
    return _pad4(struct.pack('>%d%s' % (len(vals), PACK[nc_type]), *vals))


def _attrs(attrs):
    """attrs: list of (name, nc_type, values-or-string)."""
    if not attrs:
        return struct.pack('>ii', 0, 0)  # ABSENT
    out = struct.pack('>ii', 0x0C, len(attrs))
    for (n, t, v) in attrs:
        nelems = len(v) if t == NC_CHAR else len(v)
        out += _name(n) + struct.pack('>ii', t, nelems) + _values(t, v)
    return out


class Var:
    def __init__(self, name, dims, nc_type, attrs=None, data=None):
        self.name, self.dims, self.nc_type = name, dims, nc_type
        self.attrs = attrs or []
        self.data = data  # flat list (non-record: full; record: per-record slab appended by numrecs)
        self.begin = 0
        self.vsize = 0


def write_nc(path, dims, gatts, variables, numrecs=0, version=1):
    """dims: list of (name, length) with length 0 = record dim."""
    dim_len = {i: l for i, (_, l) in enumerate(dims)}

    def slab_elems(v, skip_record=True):
        n = 1
        for d in v.dims:
            if dim_len[d] == 0 and skip_record:
                continue
            n *= dim_len[d]
        return n

    # vsize: per-record (record vars) or total (fixed vars) slab, padded to 4
    for v in variables:
        raw = slab_elems(v) * SIZES[v.nc_type]
        v.vsize = raw + ((4 - raw % 4) % 4)
    rec_vars = [v for v in variables if v.dims and dim_len[v.dims[0]] == 0]
    fix_vars = [v for v in variables if v not in rec_vars]

    # header size (two passes: begin offsets appear inside the header)
    def header(begin_known):
        h = b'CDF' + bytes([version]) + struct.pack('>i', numrecs)
        if dims:
            h += struct.pack('>ii', 0x0A, len(dims))
            for (n, l) in dims:
                h += _name(n) + struct.pack('>i', l)
        else:
            h += struct.pack('>ii', 0, 0)
        h += _attrs(gatts)
        if variables:
            h += struct.pack('>ii', 0x0B, len(variables))
            for v in variables:
                h += _name(v.name) + struct.pack('>i', len(v.dims))
                h += struct.pack('>%di' % len(v.dims), *v.dims) if v.dims else b''
                h += _attrs(v.attrs)
                h += struct.pack('>ii', v.nc_type, v.vsize)
                h += struct.pack('>i' if version == 1 else '>q',
                                 v.begin if begin_known else 0)
        else:
            h += struct.pack('>ii', 0, 0)
        return h

    hlen = len(header(False))
    off = hlen
    for v in fix_vars:
        v.begin = off
        off += v.vsize
    rec_start = off
    # record stride: sum of padded vsizes; exactly-one-record-var special
    # case uses the UNPADDED slab (spec: "in the special case when there is
    # exactly one record variable, it is not padded")
    if len(rec_vars) == 1:
        stride = slab_elems(rec_vars[0]) * SIZES[rec_vars[0].nc_type]
        rec_vars[0].vsize = stride
    else:
        stride = sum(v.vsize for v in rec_vars)
    o = rec_start
    for v in rec_vars:
        v.begin = o
        o += v.vsize if len(rec_vars) > 1 else 0

    body = bytearray()
    for v in fix_vars:
        raw = struct.pack('>%d%s' % (len(v.data), PACK[v.nc_type]), *v.data)
        body += _pad4(raw) if len(raw) % 4 else raw
    for r in range(numrecs):
        for v in rec_vars:
            n = slab_elems(v)
            raw = struct.pack('>%d%s' % (n, PACK[v.nc_type]), *v.data[r * n:(r + 1) * n])
            if len(rec_vars) > 1 and len(raw) % 4:
                raw = _pad4(raw)
            body += raw
    with open(path, 'wb') as f:
        f.write(header(True) + bytes(body))
    print(f"{path}: {hlen + len(body)} bytes, {len(variables)} vars, numrecs={numrecs}")


def linspace(a, b, n):
    # endpoint pinned exactly, as numpy.linspace does
    return [a + (b - a) * i / (n - 1) for i in range(n - 1)] + [b]


def s(x):  # string attr helper
    return (NC_CHAR, x)


def d(*xs):  # double attr helper
    return (NC_DOUBLE, list(xs))


def nh10km(outdir):
    """test_cf.py:_prepare_cf_nh10km — 760x1120 polar_stereographic, km axes,
    record time dim with zero records, byte-packed lat/lon."""
    nx, ny = 760, 1120
    dims = [('time', 0), ('yc', ny), ('xc', nx)]
    variables = [
        Var('ice_conc', [0, 1, 2], NC_SHORT,
            [('grid_mapping', *s('Polar_Stereographic_Grid')),
             ('coordinates', *s('lat lon'))]),
        Var('xc', [2], NC_DOUBLE,
            [('standard_name', *s('projection_x_coordinate')), ('units', *s('km'))],
            linspace(-3845.0, 3745.0, nx)),
        Var('yc', [1], NC_DOUBLE,
            [('standard_name', *s('projection_y_coordinate')), ('units', *s('km'))],
            linspace(5845.0, -5345.0, ny)),
        Var('lat', [1, 2], NC_BYTE,
            [('units', *s('degrees_north')), ('standard_name', *s('latitude'))],
            [0] * (ny * nx)),
        Var('lon', [1, 2], NC_BYTE,
            [('units', *s('degrees_east')), ('standard_name', *s('longitude'))],
            [0] * (ny * nx)),
        Var('Polar_Stereographic_Grid', [], NC_INT,
            [('grid_mapping_name', *s('polar_stereographic')),
             ('false_easting', *d(0.0)), ('false_northing', *d(0.0)),
             ('semi_major_axis', *d(6378273.0)),
             ('semi_minor_axis', *d(6356889.44891)),
             ('straight_vertical_longitude_from_pole', *d(-45.0)),
             ('latitude_of_projection_origin', *d(90.0)),
             ('standard_parallel', *d(70.0))],
            [0]),
    ]
    write_nc(os.path.join(outdir, 'nh10km.nc'), dims,
             [('Conventions', *s('CF-1.7'))], variables, numrecs=0)


def goes(outdir):
    """test_cf.py:_prepare_cf_goes at reduced 25x15 resolution — radians
    axes on a geostationary grid (the x-by-satellite-height conversion
    path), with real payload data; CDF-2 (64-bit offsets)."""
    h = 35786023.0
    w, ht = 25, 15
    ext = (-3627271.2913 / h, 1583173.6575 / h, 1382771.9287 / h, 4589199.5895 / h)
    x = linspace(ext[0], ext[2], w)
    y = linspace(ext[3], ext[1], ht)
    payload = [float((r * w + c) % 97) / 8.0 for r in range(ht) for c in range(w)]
    # C13T: the same payload stored with TRANSPOSED dims (x, y) — readGrid
    # must un-transpose it to the identical row-major cell mapping
    payload_t = [payload[r * w + c] for c in range(w) for r in range(ht)]
    dims = [('y', ht), ('x', w)]
    variables = [
        Var('C13', [0, 1], NC_FLOAT, [('grid_mapping', *s('GOES-East'))], payload),
        Var('C13T', [1, 0], NC_FLOAT, [('grid_mapping', *s('GOES-East'))], payload_t),
        Var('x', [1], NC_DOUBLE,
            [('units', *s('radians')), ('standard_name', *s('projection_x_coordinate'))], x),
        Var('y', [0], NC_DOUBLE,
            [('units', *s('radians')), ('standard_name', *s('projection_y_coordinate'))], y),
        Var('GOES-East', [], NC_INT,
            [('grid_mapping_name', *s('geostationary')),
             ('false_easting', *d(0.0)), ('false_northing', *d(0.0)),
             ('semi_major_axis', *d(6378137.0)),
             ('semi_minor_axis', *d(6356752.31414)),
             ('latitude_of_projection_origin', *d(0.0)),
             ('longitude_of_projection_origin', *d(-75.0)),
             ('perspective_point_height', *d(35786023.0)),
             ('sweep_angle_axis', *s('x'))],
            [0]),
    ]
    write_nc(os.path.join(outdir, 'goes.nc'), dims, [], variables, version=2)


def llwgs84(outdir):
    """test_cf.py:_prepare_cf_llwgs84 — 19x37 latitude_longitude grid."""
    nlat, nlon = 19, 37
    dims = [('lat', nlat), ('lon', nlon)]
    variables = [
        Var('temp', [0, 1], NC_FLOAT, [('grid_mapping', *s('crs'))],
            [0.0] * (nlat * nlon)),
        Var('lat', [0], NC_DOUBLE,
            [('units', *s('degreesN')), ('standard_name', *s('latitude'))],
            linspace(-90.0, 90.0, nlat)),
        Var('lon', [1], NC_DOUBLE,
            [('units', *s('degreesE')), ('standard_name', *s('longitude'))],
            linspace(-180.0, 180.0, nlon)),
        Var('crs', [], NC_INT,
            [('grid_mapping_name', *s('latitude_longitude')),
             ('longitude_of_prime_meridian', *d(0.0)),
             ('semi_major_axis', *d(6378137.0)),
             ('inverse_flattening', *d(298.257223563))],
            [0]),
    ]
    write_nc(os.path.join(outdir, 'llwgs84.nc'), dims, [], variables)


def llnocrs(outdir):
    """test_cf.py:_prepare_cf_llnocrs — no grid_mapping at all: the
    latlon-default (WGS84) discovery path."""
    nlat, nlon = 19, 37
    dims = [('lat', nlat), ('lon', nlon)]
    variables = [
        Var('temp', [0, 1], NC_FLOAT, [], [0.0] * (nlat * nlon)),
        Var('lat', [0], NC_DOUBLE,
            [('units', *s('degreeN')), ('standard_name', *s('latitude'))],
            linspace(-90.0, 90.0, nlat)),
        Var('lon', [1], NC_DOUBLE,
            [('units', *s('degreeE')), ('standard_name', *s('longitude'))],
            linspace(-180.0, 180.0, nlon)),
    ]
    write_nc(os.path.join(outdir, 'llnocrs.nc'), dims, [], variables)


def packed(outdir):
    """test_cf.py:_prepare_cf_projected_packed_xy — int16 axes with
    scale_factor/add_offset, plus a multi-record time series (2 record
    vars: the padded-record-stride path)."""
    dims = [('time', 0), ('y', 3), ('x', 3)]
    variables = [
        Var('temp', [1, 2], NC_FLOAT, [('grid_mapping', *s('crs'))], [0.0] * 9),
        Var('x', [2], NC_SHORT,
            [('standard_name', *s('projection_x_coordinate')), ('units', *s('m')),
             ('scale_factor', *d(10.0)), ('add_offset', *d(1000.0))],
            [-100, 0, 100]),
        Var('y', [1], NC_SHORT,
            [('standard_name', *s('projection_y_coordinate')), ('units', *s('m')),
             ('scale_factor', *d(10.0)), ('add_offset', *d(1000.0))],
            [100, 0, -100]),
        Var('crs', [], NC_INT,
            [('grid_mapping_name', *s('stereographic')),
             ('false_easting', *d(0.0)), ('false_northing', *d(0.0)),
             ('semi_major_axis', *d(6378137.0)),
             ('inverse_flattening', *d(298.257223563)),
             ('latitude_of_projection_origin', *d(90.0)),
             ('longitude_of_projection_origin', *d(0.0)),
             ('scale_factor_at_projection_origin', *d(1.0))],
            [0]),
        # two record vars -> padded interleaved record stride
        Var('tseries', [0], NC_SHORT, [], [11, 22, 33]),
        Var('tflag', [0], NC_BYTE, [], [1, 0, 1]),
    ]
    write_nc(os.path.join(outdir, 'packed.nc'), dims, [], variables, numrecs=3)


def modis_sinu(outdir):
    """MODIS-style sinusoidal grid: a 120x120 downsample of tile h18v04
    (sphere R=6371007.181, metre axes), `sinusoidal` grid mapping."""
    n = 120
    tile = 1111950.5196666666  # 10 deg of great-circle arc
    px = tile / n
    dims = [('y', n), ('x', n)]
    variables = [
        Var('ndvi', [0, 1], NC_FLOAT,
            [('grid_mapping', *s('sinu_crs'))], [0.0] * (n * n)),
        Var('x', [1], NC_DOUBLE,
            [('standard_name', *s('projection_x_coordinate')), ('units', *s('m'))],
            linspace(0.0 + px / 2, tile - px / 2, n)),
        Var('y', [0], NC_DOUBLE,
            [('standard_name', *s('projection_y_coordinate')), ('units', *s('m'))],
            linspace(5 * tile - px / 2, 4 * tile + px / 2, n)),
        Var('sinu_crs', [], NC_INT,
            [('grid_mapping_name', *s('sinusoidal')),
             ('longitude_of_projection_origin', *d(0.0)),
             ('false_easting', *d(0.0)), ('false_northing', *d(0.0)),
             ('earth_radius', *d(6371007.181))],
            [0]),
    ]
    write_nc(os.path.join(outdir, 'modis_sinu.nc'), dims,
             [('Conventions', *s('CF-1.7'))], variables)


def utm_tmerc(outdir):
    """UTM 33N as a CF transverse_mercator mapping: 60x50 @ 2km pixels."""
    nx, ny = 60, 50
    dims = [('y', ny), ('x', nx)]
    variables = [
        Var('band1', [0, 1], NC_FLOAT,
            [('grid_mapping', *s('utm_crs'))], [0.0] * (ny * nx)),
        Var('x', [1], NC_DOUBLE,
            [('standard_name', *s('projection_x_coordinate')), ('units', *s('m'))],
            linspace(401000.0, 519000.0, nx)),
        Var('y', [0], NC_DOUBLE,
            [('standard_name', *s('projection_y_coordinate')), ('units', *s('m'))],
            linspace(6299000.0, 6201000.0, ny)),
        Var('utm_crs', [], NC_INT,
            [('grid_mapping_name', *s('transverse_mercator')),
             ('latitude_of_projection_origin', *d(0.0)),
             ('longitude_of_central_meridian', *d(15.0)),
             ('scale_factor_at_central_meridian', *d(0.9996)),
             ('false_easting', *d(500000.0)), ('false_northing', *d(0.0)),
             ('semi_major_axis', *d(6378137.0)),
             ('inverse_flattening', *d(298.257223563))],
            [0]),
    ]
    write_nc(os.path.join(outdir, 'utm_tmerc.nc'), dims,
             [('Conventions', *s('CF-1.7'))], variables)


def rotated_pole(outdir):
    """COSMO/CORDEX-style rotated_latitude_longitude grid: 40x30 @ 0.5 deg
    rotated pixels, pole at (lon -162, lat 39.25), grid_latitude/
    grid_longitude axes in rotated degrees (CF example 5.6 shape)."""
    nx, ny = 40, 30
    dims = [('rlat', ny), ('rlon', nx)]
    variables = [
        Var('tas', [0, 1], NC_FLOAT,
            [('grid_mapping', *s('rotated_pole_crs'))], [0.0] * (ny * nx)),
        Var('rlon', [1], NC_DOUBLE,
            [('standard_name', *s('grid_longitude')), ('units', *s('degrees'))],
            linspace(-9.75, 9.75, nx)),
        Var('rlat', [0], NC_DOUBLE,
            [('standard_name', *s('grid_latitude')), ('units', *s('degrees'))],
            linspace(7.25, -7.25, ny)),
        Var('rotated_pole_crs', [], NC_INT,
            [('grid_mapping_name', *s('rotated_latitude_longitude')),
             ('grid_north_pole_latitude', *d(39.25)),
             ('grid_north_pole_longitude', *d(-162.0)),
             ('north_pole_grid_longitude', *d(0.0)),
             ('earth_radius', *d(6371000.0))],
            [0]),
    ]
    write_nc(os.path.join(outdir, 'rotated_pole.nc'), dims,
             [('Conventions', *s('CF-1.7'))], variables)


def badaxis(outdir):
    """A constant x axis: must fail loudly (zero spacing), not emit NaN."""
    nx, ny = 8, 6
    dims = [('y', ny), ('x', nx)]
    variables = [
        Var('band1', [0, 1], NC_FLOAT, [], [0.0] * (ny * nx)),
        Var('x', [1], NC_DOUBLE,
            [('standard_name', *s('longitude')), ('units', *s('degrees_east'))],
            [7.5] * nx),
        Var('y', [0], NC_DOUBLE,
            [('standard_name', *s('latitude')), ('units', *s('degrees_north'))],
            linspace(60.0, 50.0, ny)),
    ]
    write_nc(os.path.join(outdir, 'badaxis.nc'), dims, [], variables)


if __name__ == '__main__':
    outdir = sys.argv[1] if len(sys.argv) > 1 else 'src/test/resources/cf'
    os.makedirs(outdir, exist_ok=True)
    nh10km(outdir)
    goes(outdir)
    llwgs84(outdir)
    llnocrs(outdir)
    packed(outdir)
    modis_sinu(outdir)
    utm_tmerc(outdir)
    rotated_pole(outdir)
    badaxis(outdir)
