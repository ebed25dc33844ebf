from multimodal_sc_tpu.envs import datasets, driving
from multimodal_sc_tpu.envs.datasets import ImageDataset, synthetic_pointcloud_batch
from multimodal_sc_tpu.envs.driving import EnvState, TimeStep, reset, step
