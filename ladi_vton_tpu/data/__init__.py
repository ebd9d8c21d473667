from ladi_vton_tpu.data.dresscode import DressCodeDataset
from ladi_vton_tpu.data.vitonhd import VitonHDDataset
from ladi_vton_tpu.data.loader import BatchLoader
