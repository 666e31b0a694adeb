"""Dataset ingestion and event-stream representations (layer L0).

- `representations`: events -> dense tensors (voxel grid, time surface,
  event stack, distance map) as vectorized, jittable scatter kernels.
- `mvsec` / `ec`: MVSEC (HDF5) and Event-Camera (txt/npy/png) dataset readers
  with the reference's split/crop/pair protocols.
- `interpolator`: linear+slerp pose interpolation.
- `augment`: event/image/pair augmentations.
- `pipeline`: streaming, host-sharded input pipeline feeding the device.
"""

from . import representations
from . import interpolator
from . import augment
from . import mvsec
from . import ec
from .pipeline import DataLoader, collate, device_prefetch

__all__ = ["representations", "interpolator", "augment", "mvsec", "ec",
           "DataLoader", "collate"]
