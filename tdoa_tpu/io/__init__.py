from tdoa_tpu.io.datfile import (
    DatCapture,
    bytes_to_iq,
    iq_to_bytes,
    load_dat,
    save_dat,
    split_blocks,
)
from tdoa_tpu.io.wav import read_wav, write_wav
from tdoa_tpu.io.stations import (
    Station,
    StationTable,
    load_station_table,
    station_from_filename,
)

__all__ = [
    "DatCapture",
    "bytes_to_iq",
    "iq_to_bytes",
    "load_dat",
    "save_dat",
    "split_blocks",
    "Station",
    "StationTable",
    "load_station_table",
    "station_from_filename",
    "read_wav",
    "write_wav",
]
