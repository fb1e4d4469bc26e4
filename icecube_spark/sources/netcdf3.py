"""Classic netCDF-3 (CDF-1) bridge — dependency-free.

The reference exports cubes with xarray's to_netcdf
(icecube/bin/datacube.py:203 to_file) and re-imports them with
read_cube (datacube.py:30). This container ships no netCDF/HDF5
library, so this module implements the classic netCDF-3 binary
format directly (the NetCDF Classic Format spec: magic 'CDF\\x01',
dim/attr/var lists, big-endian fixed-size data). Files written here
open in any netCDF reader (xarray/scipy/netCDF4 — the reference's
environment), and reference-produced classic files load back.

Scale note: a single .nc is inherently a single-node artifact — the
reference's own to_file has the same property. The bridge exists for
interchange with reference-produced cubes; partitioned parquet
(cube.to_parquet) remains the at-scale storage path.
"""

from __future__ import annotations

import struct

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_DTYPES = {
    NC_BYTE: ("b", 1), NC_CHAR: ("c", 1), NC_SHORT: (">i2", 2),
    NC_INT: (">i4", 4), NC_FLOAT: (">f4", 4), NC_DOUBLE: (">f8", 8),
}
_NP_TO_NC = {"i1": NC_BYTE, "i2": NC_SHORT, "i4": NC_INT,
             "f4": NC_FLOAT, "f8": NC_DOUBLE}


def _pad(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">i", len(raw)) + _pad(raw)


def _attr_bytes(name: str, value) -> bytes:
    import numpy as np

    if isinstance(value, str):
        raw = value.encode()
        return _name(name) + struct.pack(">ii", NC_CHAR, len(raw)) + _pad(raw)
    arr = np.asarray(value)
    nct = _NP_TO_NC[arr.dtype.str[1:]] if arr.dtype.str[1:] in _NP_TO_NC else (
        NC_DOUBLE if arr.dtype.kind == "f" else NC_INT
    )
    np_t = _DTYPES[nct][0]
    data = arr.astype(np_t).tobytes()
    return _name(name) + struct.pack(">ii", nct, arr.size) + _pad(data)


def _attr_list(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)
    return struct.pack(">ii", _NC_ATTRIBUTE, len(attrs)) + b"".join(
        _attr_bytes(k, v) for k, v in attrs.items()
    )


def write_netcdf3(
    path: str,
    dims: dict[str, int],
    variables: dict[str, tuple[tuple[str, ...], "object", dict]],
    global_attrs: dict | None = None,
    version: int = 1,
) -> None:
    """Write a classic netCDF-3 file. `variables` maps name ->
    (dim_names, numpy array, attrs). No record (unlimited) dims —
    cubes are fixed-shape. `version` 1 = CDF-1 (classic), 2 = CDF-2
    (64-bit data offsets, the NETCDF3_64BIT on-disk format)."""
    import numpy as np

    if version not in (1, 2):
        raise ValueError(f"netCDF-3 version must be 1 or 2, got {version}")
    off_fmt = ">i" if version == 1 else ">q"
    off_size = 4 if version == 1 else 8
    dim_ids = {d: i for i, d in enumerate(dims)}
    header = b"CDF" + bytes([version]) + struct.pack(">i", 0)  # numrecs = 0
    header += struct.pack(">ii", _NC_DIMENSION, len(dims)) + b"".join(
        _name(d) + struct.pack(">i", n) for d, n in dims.items()
    )
    header += _attr_list(global_attrs or {})

    # lay out variables: compute each var's vsize and byte offset
    entries = []
    for vname, (vdims, arr, attrs) in variables.items():
        arr = np.asarray(arr)
        if arr.dtype.kind in ("U", "S"):
            nct = NC_CHAR
            arr = np.char.encode(arr.astype("U"), "utf-8") if arr.dtype.kind == "U" else arr
            data = arr.tobytes()
        else:
            nct = _NP_TO_NC.get(arr.dtype.str[1:]) or (
                NC_DOUBLE if arr.dtype.kind == "f" else NC_INT
            )
            data = arr.astype(_DTYPES[nct][0]).tobytes()
        entries.append((vname, vdims, attrs, nct, _pad(data)))

    var_headers = []
    for vname, vdims, attrs, nct, data in entries:
        vh = _name(vname) + struct.pack(">i", len(vdims))
        vh += b"".join(struct.pack(">i", dim_ids[d]) for d in vdims)
        vh += _attr_list(attrs or {})
        vh += struct.pack(">ii", nct, len(data))
        var_headers.append(vh)

    # var_list tag (8 bytes) + each var header + its begin offset
    base = len(header) + 8 + sum(len(vh) + off_size for vh in var_headers)
    out = header + struct.pack(">ii", _NC_VARIABLE if entries else 0, len(entries))
    offset = base
    blobs = []
    for (vname, vdims, attrs, nct, data), vh in zip(entries, var_headers):
        out += vh + struct.pack(off_fmt, offset)
        blobs.append(data)
        offset += len(data)
    with open(path, "wb") as f:
        f.write(out + b"".join(blobs))


def _read_name(buf: bytes, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack(">i", buf[pos : pos + 4])
    pos += 4
    s = buf[pos : pos + n].decode()
    pos += n + (-n % 4)
    return s, pos


def _read_attrs(buf: bytes, pos: int) -> tuple[dict, int]:
    tag, count = struct.unpack(">ii", buf[pos : pos + 8])
    pos += 8
    attrs: dict = {}
    for _ in range(count):
        name, pos = _read_name(buf, pos)
        nct, n = struct.unpack(">ii", buf[pos : pos + 8])
        pos += 8
        np_t, unit = _DTYPES[nct]
        raw = buf[pos : pos + n * unit]
        pos += n * unit + (-(n * unit) % 4)
        if nct == NC_CHAR:
            attrs[name] = raw.decode()
        else:
            import numpy as np

            vals = np.frombuffer(raw, dtype=np_t)
            attrs[name] = vals[0] if n == 1 else vals
    return attrs, pos


def read_netcdf3(path: str):
    """Read a classic netCDF-3 (CDF-1/CDF-2) file written by this
    module, scipy, or xarray's scipy engine. Returns (dims, variables,
    global_attrs) with variables mapping name -> (dim_names, ndarray,
    attrs)."""
    import numpy as np

    buf = open(path, "rb").read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a classic netCDF-3 file")
    off_fmt = ">i" if buf[3] == 1 else ">q"
    off_size = 4 if buf[3] == 1 else 8
    pos = 8  # magic + numrecs (no record vars supported)
    dims: list[tuple[str, int]] = []
    tag, count = struct.unpack(">ii", buf[pos : pos + 8])
    pos += 8
    for _ in range(count):
        dname, pos = _read_name(buf, pos)
        (size,) = struct.unpack(">i", buf[pos : pos + 4])
        pos += 4
        dims.append((dname, size))
    gattrs, pos = _read_attrs(buf, pos)
    tag, nvars = struct.unpack(">ii", buf[pos : pos + 8])
    pos += 8
    variables: dict = {}
    for _ in range(nvars):
        vname, pos = _read_name(buf, pos)
        (ndims,) = struct.unpack(">i", buf[pos : pos + 4])
        pos += 4
        vdim_ids = struct.unpack(f">{ndims}i", buf[pos : pos + 4 * ndims])
        pos += 4 * ndims
        vattrs, pos = _read_attrs(buf, pos)
        nct, vsize = struct.unpack(">ii", buf[pos : pos + 8])
        pos += 8
        (begin,) = struct.unpack(off_fmt, buf[pos : pos + off_size])
        pos += off_size
        vdims = tuple(dims[i][0] for i in vdim_ids)
        shape = tuple(dims[i][1] for i in vdim_ids)
        np_t, unit = _DTYPES[nct]
        n = 1
        for s in shape:
            n *= s
        raw = buf[begin : begin + n * unit]
        if nct == NC_CHAR:
            arr = np.frombuffer(raw, dtype="S1").reshape(shape)
        else:
            arr = np.frombuffer(raw, dtype=np_t).reshape(shape)
        variables[vname] = (vdims, arr, vattrs)
    return dict(dims), variables, gattrs


def _materialize_cube(dc, height: int, width: int, max_layers: int):
    """Driver-side materialization shared by every single-file export
    format (the same single-file step the reference's to_file
    performs), behind a cheap count() guard: exports above
    `max_layers` layers (or whose pixel payload would exceed driver
    memory) must go through the parquet/partitioned sinks instead of
    silently OOMing the driver."""
    import numpy as np

    n_layers = dc.df.count()
    approx_bytes = n_layers * height * width * 8
    if n_layers > max_layers or approx_bytes > 4 << 30:
        raise ValueError(
            f"refusing single-file netCDF export of {n_layers} layers "
            f"(~{approx_bytes / 2**30:.1f} GiB dense): the format is "
            f"driver-materialized; raise max_layers explicitly or use "
            f"the distributed parquet sink for cubes this large"
        )
    rows = dc.df.orderBy(dc.ts_col).collect()
    band = len(rows)
    pix = np.full((band, height, width), np.nan)
    names = []
    for i, r in enumerate(rows):
        p = getattr(r, "pixels", None)
        if p is not None:
            pix[i] = np.asarray(p, dtype="f8").reshape(height, width)
        names.append(getattr(r, dc.key_col) or "None")
    dates = [str(getattr(r, dc.ts_col)) for r in rows]
    return pix, names, dates


def cube_to_netcdf(
    dc,
    path: str,
    height: int,
    width: int,
    max_layers: int = 4096,
    version: int = 1,
) -> None:
    """Export a raster Datacube (one pixels-array layer per time
    slot, cube.create_cube_from_rasters shape) to a classic netCDF-3
    file the reference's read_cube/xarray can open: intensity
    (band, azimuth, range) + per-band product/date coordinate vars —
    the to_file parity surface (datacube.py:203). `version` 2 writes
    the CDF-2 (64-bit-offset) variant, i.e. NETCDF3_64BIT."""
    import numpy as np

    pix, names, date_strs = _materialize_cube(dc, height, width, max_layers)
    band = len(names)
    name_len = max(1, max(len(n) for n in names))
    name_arr = np.zeros((band, name_len), dtype="S1")
    for i, n in enumerate(names):
        b = n.encode()
        name_arr[i, : len(b)] = np.frombuffer(b, dtype="S1")
    dates = np.array(date_strs, dtype="S10").view("S1").reshape(band, 10)
    write_netcdf3(
        path,
        dims={"band": band, "azimuth": height, "range": width, "strlen": name_len,
              "datelen": 10},
        variables={
            "intensity": (("band", "azimuth", "range"), pix,
                          {"long_name": "Intensity"}),
            "product_file": (("band", "strlen"), name_arr, {}),
            "acquisition_date": (("band", "datelen"), dates, {}),
        },
        global_attrs={"source": "icecube_spark", "Conventions": "CF-1.6"},
        version=version,
    )


def _read_netcdf4_vars(path: str):
    """Pull the cube variables out of an HDF5-backed netCDF4 file:
    h5py when present, else the in-repo minimal HDF5 reader
    (sources/hdf5.py) — no library needed for numeric + string vars."""
    import numpy as np

    try:
        import h5py

        with h5py.File(path, "r") as h:
            pix = np.asarray(h["intensity"][...], dtype="f8")
            names = [
                v.decode() if isinstance(v, bytes) else str(v)
                for v in h["product_file"][...]
            ]
            dates = [
                v.decode() if isinstance(v, bytes) else str(v)
                for v in h["acquisition_date"][...]
            ]
        return pix, names, dates
    except ImportError:
        pass
    from icecube_spark.sources.hdf5 import load_h5

    with open(path, "rb") as f:
        h5 = load_h5(
            f.read(), want={"intensity", "product_file", "acquisition_date"}
        )
    pix = np.asarray(h5["intensity"], dtype="f8")
    names = [str(v) for v in np.asarray(h5["product_file"]).ravel()]
    dates = [str(v) for v in np.asarray(h5["acquisition_date"]).ravel()]
    return pix, names, dates


def netcdf_to_cube(spark, path: str):
    """Import a cube file back into a Datacube — reference read_cube
    (icecube/bin/datacube.py:30) parity: sniffs the magic bytes and
    opens classic netCDF-3 (CDF-1/CDF-2, bridge reader) and
    HDF5-backed netCDF4 files transparently."""
    import numpy as np

    from icecube_spark.cube import Datacube

    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"\x89HDF":
        pix, names, dates = _read_netcdf4_vars(path)
    else:
        dims, variables, _ = read_netcdf3(path)
        pix = variables["intensity"][1]
        names = [
            b"".join(row).decode().rstrip("\x00")
            for row in variables["product_file"][1]
        ]
        dates = [
            b"".join(row).decode() for row in variables["acquisition_date"][1]
        ]
    rows = []
    for i in range(pix.shape[0]):
        layer = pix[i]
        has = not np.isnan(layer).all()
        rows.append(
            {
                "product_file": names[i] if names[i] != "None" else None,
                "slot_date": __import__("datetime").date.fromisoformat(dates[i]),
                "pixels": [float(x) for x in layer.ravel()] if has else None,
                "height": int(layer.shape[0]),
                "width": int(layer.shape[1]),
            }
        )
    df = spark.createDataFrame(rows)
    return Datacube(df, "product_file", "slot_date", ["pixels"])


def cube_to_file(
    dc,
    path: str,
    height: int,
    width: int,
    format: str = "netCDF4",
    max_layers: int = 4096,
) -> str:
    """Reference `Datacube.to_file(output_fpath, format="netCDF4")`
    parity (icecube/bin/datacube.py:203): format one of
    {NETCDF4, NETCDF4_CLASSIC, NETCDF3_64BIT, NETCDF3_CLASSIC}.

    netCDF4 formats are HDF5-based and need a netCDF4/h5py stack; when
    the `netCDF4` library is importable the export is a true netCDF4
    file (xarray-openable). Without it the export degrades to the
    dependency-free classic netCDF-3 bridge (same variables and
    coordinates — any netCDF reader, including xarray, opens that
    too). NETCDF3_64BIT always writes a true CDF-2 (64-bit-offset)
    file via the bridge — no library needed. Returns the format
    actually written so callers can tell.
    """
    fmt = format.upper().replace("-", "")
    if fmt not in {"NETCDF4", "NETCDF4_CLASSIC", "NETCDF3_64BIT", "NETCDF3_CLASSIC"}:
        raise ValueError(f"unknown netCDF format {format!r}")
    if fmt == "NETCDF3_CLASSIC":
        cube_to_netcdf(dc, path, height, width, max_layers=max_layers)
        return "NETCDF3_CLASSIC"
    if fmt == "NETCDF3_64BIT":
        cube_to_netcdf(
            dc, path, height, width, max_layers=max_layers, version=2
        )
        return "NETCDF3_64BIT"
    try:
        import netCDF4  # noqa: F401
    except ImportError:
        cube_to_netcdf(dc, path, height, width, max_layers=max_layers)
        return "NETCDF3_CLASSIC"

    pix, names, dates = _materialize_cube(dc, height, width, max_layers)
    ds = netCDF4.Dataset(path, "w", format=fmt)
    try:
        ds.createDimension("band", len(names))
        ds.createDimension("azimuth", height)
        ds.createDimension("range", width)
        v = ds.createVariable("intensity", "f8", ("band", "azimuth", "range"))
        v.long_name = "Intensity"
        v[:] = pix
        nv = ds.createVariable("product_file", str, ("band",))
        dv = ds.createVariable("acquisition_date", str, ("band",))
        for i, (n, d) in enumerate(zip(names, dates)):
            nv[i] = n
            dv[i] = d
        ds.source = "icecube_spark"
        ds.Conventions = "CF-1.6"
    finally:
        ds.close()
    return fmt
