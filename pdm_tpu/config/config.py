"""Experiment configuration: pydantic models for all config groups plus the
derived experiment-name and artifact-path properties that define the
pipeline's on-disk contract.

Capability parity: reference ``config/config.py`` — same groups, fields and
path conventions (checkpoints/{exp}, stats/{ds}_forward.npz,
stats/{ds}_metric.npz, samples/..., fid/{exp}.csv) so artifacts
interoperate between the two stacks.
"""

from __future__ import annotations

from typing import Literal, Any, Dict, List, Optional, Tuple

from pydantic import BaseModel, Field

from .datasets import BaseDatasetConfig, DatasetRegistry


class DiffusionConfig(BaseModel):
    min_temp: float = Field(..., description="Minimum temperature")
    max_temp: float = Field(..., description="Maximum temperature")

    @property
    def temp_range(self) -> Tuple[float, float]:
        return (self.min_temp, self.max_temp)


class EntropyScheduleConfig(BaseModel):
    extrapolate: bool = Field(..., description="Extrapolate entropy schedule")
    min_temp: float = Field(..., description="Minimum temperature")
    max_temp: float = Field(..., description="Maximum temperature")


class DDPMConfig(BaseModel):
    model_name: str = Field(..., description="Model architecture (unet/true/diffusers)")
    parametrization: str = Field(..., description="Head parametrization (x0/eps/score)")
    noise_schedule_type: str = Field(..., description="Training noise schedule type")
    unet_config: Optional[Dict[str, Any]] = Field(
        None, description="UNet architecture overrides"
    )
    precision: str = Field("bf16", description="UNet compute dtype (f32/bf16)")
    diffusers_path: Optional[str] = Field(
        None,
        description=(
            "Local diffusers checkpoint dir for model_name=diffusers "
            "(default: pretrained/{dataset diffusers_id})"
        ),
    )


class DDPMTrainingConfig(BaseModel):
    batch_size: int = Field(..., description="Training batch size")
    total_iters: int = Field(..., description="Total training iterations")
    learning_rate: float = Field(..., description="Peak learning rate")
    weight_decay: float = Field(..., description="Weight decay")
    ema_decay: float = Field(..., description="EMA decay of parameters")
    eval_steps: int = Field(..., description="Steps between eval phases")
    warmup_steps: int = Field(..., description="LR warmup steps")
    betas: Tuple[float, float] = Field(..., description="Adam betas")
    grad_clip: float = Field(..., description="Global gradient-norm clip")
    keep_checkpoints: Optional[int] = Field(
        3,
        description=(
            "Keep this many newest complete checkpoints (latest.txt's "
            "target always survives); null keeps every step_{n} dir "
            "(~280 GB at the reference's 1.5M-iter cadence)"
        ),
    )
    grad_accum: int = Field(
        1,
        ge=1,
        description=(
            "Gradient-accumulation micro-steps per optimizer step: the "
            "global batch_size splits into this many sequential "
            "micro-batches inside the one jitted step (reaches the "
            "reference's global batch on memory-tight 256x256 configs)"
        ),
    )
    use_wandb: bool = Field(
        False,
        description=(
            "Mirror metrics/eval images to wandb (resume='allow', "
            "id=experiment_name — reference ddpm_trainer.py:182-188); "
            "CSV logging always stays on"
        ),
    )
    data_layout: Literal["nchw", "nhwc"] = Field(
        "nchw",
        description=(
            "Device-resident training-set layout: 'nhwc' stores the "
            "dataset conv-native and deletes the per-step layout "
            "transpose from the train hot path (loss math is "
            "layout-invariant — tests/test_unet_trainer.py)"
        ),
    )


class DataAugmentationConfig(BaseModel):
    use_augmentation: bool = Field(False, description="Enable augmentation")
    horizontal_flip: bool = Field(False, description="Random horizontal flips")


class SampleConfig(BaseModel):
    n_steps: int = Field(..., description="Sampling steps")
    step_type: Literal["ddpm", "ddim", "heun", "dpmpp_2m"] = Field(
        ..., description="Step rule (ddpm/ddim/heun)"
    )
    noise_schedule_type: str = Field(..., description="Sampling schedule type")
    noise_schedule_path: Optional[str] = Field(
        None, description="Path to custom schedule artifact"
    )
    n_samples: int = Field(..., description="Number of samples")
    batch_size: int = Field(..., description="Sampling batch size")
    precision: str = Field(..., description="full or half (bf16)")
    track_states: bool = Field(False, description="Record intermediate states")


class ForwardStatsConfig(BaseModel):
    n_samples: int = Field(..., description="MC trajectory starts")
    batch_size: int = Field(..., description="Trajectory batch size")
    dataloader_batch_size: int = Field(..., description="Dataset streaming chunk")
    n_temps: int = Field(..., description="Number of temperatures")
    stream_chunk: Optional[int] = Field(
        None,
        description=(
            "Host-streaming tier for datasets larger than HBM: keep the "
            "dataset in host RAM and sweep it in device-resident chunks "
            "of this many points (exact shift-stabilized moment merge; "
            "single-device, no adaptive kNN)"
        ),
    )


class EmpiricalStatsConfig(BaseModel):
    n_temps: int = Field(..., description="Number of temperatures")
    n_steps_per_temp: int = Field(..., description="Accumulation steps per temp")
    batch_size: int = Field(..., description="Batch size")
    min_temp: Optional[float] = Field(None, description="Sweep min temperature")
    max_temp: Optional[float] = Field(None, description="Sweep max temperature")


class FIDConfig(BaseModel):
    n_steps: List[int] = Field(..., description="Step counts for the sweep")
    noise_schedule_type: List[str] = Field(..., description="Schedules for the sweep")
    noise_schedule_path: Optional[List[Optional[str]]] = Field(
        None, description="Custom schedule paths"
    )
    min_temp: List[float] = Field(..., description="Min temperatures for the sweep")
    train: bool = Field(..., description="Reference = train split")
    sample: bool = Field(..., description="Sample fresh or reuse saved samples")
    samples: Optional[int] = Field(
        None,
        description=(
            "Override the dataset's FID protocol sample count "
            "(dataset_config.fid_samples, 50k for the BASELINE rows) — "
            "for quick sweeps and the offline dress rehearsal"
        ),
    )
    required: bool = Field(
        False,
        description="Hard-fail when the FID feature extractor is "
        "unavailable (default: warn loudly at every eval and continue)",
    )


class ParallelConfig(BaseModel):
    """New capability vs the reference (single-accelerator): mesh layout."""

    data_axis: Optional[int] = Field(None, description="Mesh 'data' axis size (None = all/model)")
    model_axis: int = Field(1, description="Mesh 'model' axis size (TP/SP)")
    model_partition: Literal["channel", "spatial"] = Field(
        "channel",
        description=(
            "What the 'model' axis shards: 'channel' = tensor parallelism "
            "(output channels + attention heads), 'spatial' = spatial "
            "parallelism (activation H axis; GSPMD halo-exchange convs — "
            "the memory axis for 256x256 models)"
        ),
    )
    fsdp: bool = Field(
        False,
        description=(
            "Fully-sharded data parallelism (ZeRO-3): parameters, EMA and "
            "Adam moments shard over the 'data' axis (1/data_size memory "
            "per chip); GSPMD all-gathers weights per layer and "
            "reduce-scatters gradients. Composes with model_partition"
        ),
    )


class Config(BaseModel):
    dataset_name: str = Field(..., description="Dataset name")
    diffusion: DiffusionConfig
    entropy_schedule: EntropyScheduleConfig
    ddpm: DDPMConfig
    ddpm_training: DDPMTrainingConfig
    data_augmentation: DataAugmentationConfig
    sample: SampleConfig
    forward_stats: ForwardStatsConfig
    empirical_stats: EmpiricalStatsConfig
    fid: FIDConfig
    parallel: ParallelConfig = ParallelConfig()

    # ------------------------------------------------------------------

    @property
    def available_datasets(self) -> List[str]:
        if self.dataset_name == "all":
            return DatasetRegistry.get_dataset_names()
        return [self.dataset_name]

    @property
    def dataset_config(self) -> BaseDatasetConfig:
        return DatasetRegistry.get(self.dataset_name)

    @property
    def ddpm_config_name(self) -> str:
        if self.ddpm.model_name == "unet":
            return (
                f"unet_{self.ddpm.parametrization}_"
                f"{self.ddpm.noise_schedule_type}_schedule"
            )
        return self.ddpm.model_name

    @property
    def experiment_name(self) -> str:
        parts = [self.dataset_name, self.ddpm_config_name]
        if (
            self.ddpm.noise_schedule_type == "entropy"
            and self.entropy_schedule.min_temp != 1e-4
        ):
            parts.append(f"min_temp={self.entropy_schedule.min_temp}")
        return "_".join(parts)

    @property
    def project_name(self) -> str:
        return "physics-of-diffusion-models"

    @property
    def checkpoint_dir(self) -> str:
        return f"checkpoints/{self.experiment_name}"

    @property
    def ddpm_checkpoint_path(self) -> str:
        return f"{self.checkpoint_dir}/latest.txt"

    @property
    def samples_path(self) -> str:
        return "_".join(
            [
                f"samples/{self.experiment_name}",
                str(self.sample.n_steps),
                self.sample.step_type,
                "steps",
            ]
        )

    @property
    def forward_stats_path(self) -> str:
        return f"stats/{self.dataset_name}_forward.npz"

    @property
    def metric_stats_path(self) -> str:
        return f"stats/{self.dataset_name}_metric.npz"

    @property
    def empirical_stats_path(self) -> str:
        return f"stats/{self.experiment_name}_empirical.npz"

    @property
    def fid_results_path(self) -> str:
        return f"fid/{self.experiment_name}.csv"
