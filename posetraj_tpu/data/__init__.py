from posetraj_tpu.data.trajectories import load_cotracker_json, trajectories_to_array  # noqa: F401
from posetraj_tpu.data.datasets import TrajectoryBlenderDataset, TrajectoryVIPSegDataset  # noqa: F401
from posetraj_tpu.data import export  # noqa: F401
