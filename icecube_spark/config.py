"""Cube configuration — parity with the reference's CubeConfig.

Reference: icecube/bin/config.py:27-210. Same keys, same defaults,
same validation rules, but immutable and framework-free. The config
drives `icecube_spark.cube.build_cube`, whose filters become Catalyst
range predicates instead of pandas index slices.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field, replace
from datetime import datetime

POSSIBLE_KEYS = [
    "start_date",
    "end_date",
    "min_incidence_angle",
    "max_incidence_angle",
    "temporal_resolution",
    "coregistered",
    "space_overlap",
    "temporal_overlap",
]


@dataclass(frozen=True)
class CubeConfig:
    """User cube configuration (reference icecube/bin/config.py:49-60).

    - start_date/end_date: yyyymmdd int or str bounds on acquisitions
    - min/max_incidence_angle: inclusive float range filter
    - temporal_resolution: grid step in days; 0 = natural timeline
    - coregistered: stack is already aligned (disables space_overlap)
    - space_overlap: keep only rasters intersecting the earliest one
    - temporal_overlap: True keeps same-date rasters; False keeps only
      the latest acquisition per date
    """

    start_date: datetime = field(default=datetime(1970, 1, 1))
    end_date: datetime = field(default_factory=lambda: datetime.today())
    min_incidence_angle: float = 0.0
    max_incidence_angle: float = 90.0
    temporal_resolution: int = 0
    coregistered: bool = False
    space_overlap: bool = False
    temporal_overlap: bool = True

    def __post_init__(self):
        if self.end_date < self.start_date:
            raise ValueError("end date must be >= equal to start date")
        if self.max_incidence_angle < self.min_incidence_angle:
            raise ValueError("max_incidence_angle must be >= min_incidence_angle")

    @staticmethod
    def _parse_date(value) -> datetime:
        return datetime.strptime(str(value), "%Y%m%d")

    @classmethod
    def from_dict(cls, user_config: dict) -> "CubeConfig":
        """Validate + parse a user dict (reference _validate_user_config)."""
        import warnings

        for key in user_config:
            if key not in POSSIBLE_KEYS:
                warnings.warn(
                    f"found un-supported key in user configuration: {key}",
                    stacklevel=2,
                )
        kwargs = {}
        if "start_date" in user_config:
            kwargs["start_date"] = cls._parse_date(user_config["start_date"])
        if "end_date" in user_config:
            kwargs["end_date"] = cls._parse_date(user_config["end_date"])
        for k in ("min_incidence_angle", "max_incidence_angle"):
            if k in user_config:
                kwargs[k] = float(user_config[k])
        if "temporal_resolution" in user_config:
            tr = user_config["temporal_resolution"]
            if not isinstance(tr, int):
                raise ValueError("temporal_resolution must be int")
            kwargs["temporal_resolution"] = tr
        for k in ("coregistered", "space_overlap", "temporal_overlap"):
            if k in user_config:
                kwargs[k] = bool(user_config[k])
        return cls(**kwargs)

    @classmethod
    def load(cls, json_fpath: str | None) -> "CubeConfig":
        if json_fpath is None:
            return cls()
        with open(json_fpath) as f:
            return cls.from_dict(json.load(f))

    def with_(self, **kwargs) -> "CubeConfig":
        return replace(self, **kwargs)
