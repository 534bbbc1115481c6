"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

All tests run on the CPU backend so they are hermetic and fast; the same
code JIT-compiles unchanged on TPU. The 8 virtual devices let the
multi-chip sharding tests build a real ``jax.sharding.Mesh``.
"""

import os

# Hermetic: drop the axon TPU-tunnel trigger BEFORE any test spawns a
# subprocess. The axon sitecustomize dials the relay at interpreter
# start in EVERY python process when this is set — even under
# JAX_PLATFORMS=cpu — and a half-dead tunnel blocks the dial
# indefinitely (observed: the dryrun_multichip subprocess test timing
# out at 600 s on a 9-second workload). CPU tests must never depend on
# tunnel health.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize imports jax at interpreter start, freezing its
# config from the original environment — override via jax.config too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def omaha_stations():
    """The reference deployment geometry (lat-lon-table.csv): three
    receivers around Omaha plus the NOAA reference transmitter and the
    KEVO target used for ground-truth runs."""
    return {
        "names": ("kx0u", "n3pay", "kf0mtl"),
        "station_lla": np.array(
            [
                [41.18660274289527, -95.96064116595667, 355.69],
                [41.24669616513154, -96.08366304481238, 329.0],
                [41.32916620016985, -96.03513381562004, 373.18],
            ]
        ),
        "ref_tx_lla": np.array([41.25703803095629, -95.95512763589404, 349.07]),
        "tgt_tx_lla": np.array([41.30888549464701, -96.02619229605524, 356.0]),
        "ref_freq": 162_400_000.0,
        "tgt_freq": 101_900_000.0,
    }


@pytest.fixture
def station_csv(tmp_path, omaha_stations):
    """A lat-lon-table.csv in the reference's format."""
    path = tmp_path / "lat-lon-table.csv"
    s = omaha_stations
    lines = ["Name,Latitude,Longitude,Elevation"]
    lines.append(
        "KEVO,{},{},{}".format(*s["tgt_tx_lla"])
    )
    lines.append("162400000,{},{},{}".format(*s["ref_tx_lla"]))
    for name, row in zip(s["names"], s["station_lla"]):
        lines.append(f"{name},{row[0]},{row[1]},{row[2]}")
    path.write_text("\n".join(lines) + "\n")
    return str(path)
