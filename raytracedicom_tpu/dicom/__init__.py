from .ct import read_ct_series
from .rtplan import beam_from_ion_beam, read_ion_plan
from .writer import write_ct_series, write_ion_plan

__all__ = [
    "read_ct_series", "read_ion_plan", "beam_from_ion_beam",
    "write_ct_series", "write_ion_plan",
]
