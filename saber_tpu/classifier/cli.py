"""`saber classifier` command group
(reference saber/classifier/cli.py + train.py:134-178, inference.py:114-133)."""

import click


@click.group(name="classifier")
def classifier_routines():
    """Train and apply domain-expert classifiers."""


@classifier_routines.command(name="train")
@click.option("--train-zarr", required=True, multiple=True)
@click.option("--val-zarr", default=None, multiple=True)
@click.option("--model-name", default="SAM2", show_default=True,
              type=click.Choice(["SAM2", "ConvNeXt", "SwinTransformer"]))
@click.option("--sam2-cfg", default="tiny", show_default=True)
@click.option("--num-epochs", default=100, show_default=True)
@click.option("--batch-size", default=16, show_default=True)
@click.option("--lr", default=5e-4, show_default=True)
@click.option("--results-dir", default="results", show_default=True)
def train_cmd(train_zarr, val_zarr, model_name, sam2_cfg, num_epochs,
              batch_size, lr, results_dir):
    """Train a classifier on annotated zarr data."""
    from saber_tpu.classifier.train import run
    run(list(train_zarr) if len(train_zarr) > 1 else train_zarr[0],
        list(val_zarr) if len(val_zarr) > 1 else (val_zarr[0] if val_zarr else None),
        model_name=model_name, sam2_cfg=sam2_cfg, num_epochs=num_epochs,
        batch_size=batch_size, lr=lr, results_dir=results_dir)


@classifier_routines.command(name="predict")
@click.option("--input", required=True, help="candidate-mask zarr")
@click.option("--model-config", required=True)
@click.option("--model-weights", default=None)
@click.option("--output", default="predictions.zarr", show_default=True)
@click.option("--target-class", type=int, default=None)
@click.option("--batch-size", default=32, show_default=True)
def predict_cmd(input, model_config, model_weights, output, target_class,
                batch_size):
    """Score candidate masks with a trained classifier."""
    from saber_tpu.classifier.inference import predict
    predict(input, model_config, model_weights, output, target_class,
            batch_size)


@classifier_routines.command(name="evaluate")
@click.option("--test-zarr", required=True)
@click.option("--model-config", required=True)
@click.option("--model-weights", default=None)
@click.option("--output-csv", default="evaluation.csv", show_default=True)
def evaluate_cmd(test_zarr, model_config, model_weights, output_csv):
    """Evaluate a classifier on a held-out zarr; writes per-class CSV."""
    from saber_tpu.classifier.evaluator import evaluate
    m = evaluate(test_zarr, model_config, model_weights, output_csv=output_csv)
    click.echo(f"macro F1: {m['macro_f1']:.4f} → {output_csv}")


@classifier_routines.command(name="prep3d")
@click.option("--input", required=True)
@click.option("--output", default="training_data.zarr", show_default=True)
@click.option("--voxel-size", type=float, default=None)
@click.option("--sam2-cfg", default="small", show_default=True)
@click.option("--slab-thickness", default=10, show_default=True)
@click.option("--min-mask-area", default=50, show_default=True)
def prep3d_cmd(input, output, voxel_size, sam2_cfg, slab_thickness,
               min_mask_area):
    """Generate candidate masks from tomogram slabs for annotation."""
    from saber_tpu.classifier.preprocess.tomo_prep import prep3d
    prep3d(input, output, voxel_size, sam2_cfg, slab_thickness,
           min_mask_area=min_mask_area)


@classifier_routines.command(name="prep2d")
@click.option("--input", required=True)
@click.option("--output", default="training_data.zarr", show_default=True)
@click.option("--sam2-cfg", default="small", show_default=True)
@click.option("--scale-factor", default=1.0, show_default=True)
@click.option("--min-mask-area", default=50, show_default=True)
def prep2d_cmd(input, output, sam2_cfg, scale_factor, min_mask_area):
    """Generate candidate masks from micrographs for annotation."""
    from saber_tpu.classifier.preprocess.micro_prep import prep2d
    prep2d(input, output, sam2_cfg, scale_factor, min_mask_area)


@classifier_routines.command(name="split")
@click.option("--input", required=True)
@click.option("--train-ratio", default=0.8, show_default=True)
@click.option("--val-ratio", default=0.1, show_default=True)
@click.option("--seed", default=42, show_default=True)
def split_cmd(input, train_ratio, val_ratio, seed):
    """Split an annotation zarr into train/val/test."""
    from saber_tpu.classifier.preprocess.split_merge_data import split_dataset
    paths = split_dataset(input, train_ratio, val_ratio, seed)
    click.echo("wrote: " + ", ".join(paths))


@classifier_routines.command(name="merge")
@click.option("--inputs", required=True, multiple=True)
@click.option("--output", required=True)
def merge_cmd(inputs, output):
    """Merge several annotation zarrs."""
    from saber_tpu.classifier.preprocess.split_merge_data import merge_datasets
    merge_datasets(list(inputs), output)


@classifier_routines.command(name="label")
@click.option("--input", required=True, help="candidate-mask zarr")
@click.option("--annotations", required=True, help="GUI annotation JSON")
@click.option("--output", default="labeled_data.zarr", show_default=True)
def label_cmd(input, annotations, output):
    """Apply GUI annotations → per-class training label stacks."""
    from saber_tpu.classifier.preprocess.apply_labels import labeler
    labeler(input, annotations, output)


@classifier_routines.command(name="info")
@click.option("--input", required=True)
def info_cmd(input):
    """Summarize a training zarr."""
    from saber_tpu.classifier.preprocess.training_data_info import training_data_info
    info = training_data_info(input)
    click.echo(f"runs: {info['runs']}")
    for k, v in sorted(info["per_class"].items()):
        click.echo(f"  labels/{k}: {v} planes")
    if info["labels"]:
        click.echo(f"class names: {info['labels']}")


@classifier_routines.command(name="predict-slurm")
@click.option("--input", required=True)
@click.option("--model-config", required=True)
@click.option("--output", default="predictions.zarr", show_default=True)
@click.option("--shell-name", default="submit_predict.sh", show_default=True)
@click.option("--partition", default="tpu", show_default=True)
def predict_slurm_cmd(input, model_config, output, shell_name, partition):
    """Generate an sbatch script for batch classifier prediction
    (reference inference.py:114-133)."""
    from saber_tpu.utils.slurm_submit import (create_shellsubmit,
                                              passthrough_command)
    cmd = passthrough_command("saber classifier predict", {
        "input": input, "model_config": model_config, "output": output})
    path = create_shellsubmit("saber-predict", "saber-predict-%j.out",
                              shell_name, cmd, partition=partition)
    click.echo(f"wrote {path}")


@classifier_routines.command(name="train-slurm")
@click.option("--train-zarr", required=True)
@click.option("--val-zarr", default=None)
@click.option("--model-name", default="SAM2", show_default=True)
@click.option("--shell-name", default="submit_train.sh", show_default=True)
@click.option("--partition", default="tpu", show_default=True)
def train_slurm_cmd(train_zarr, val_zarr, model_name, shell_name, partition):
    """Generate an sbatch script for classifier training."""
    from saber_tpu.utils.slurm_submit import (create_shellsubmit,
                                              passthrough_command)
    cmd = passthrough_command("saber classifier train", {
        "train_zarr": train_zarr, "model_name": model_name,
        "val_zarr": val_zarr})
    path = create_shellsubmit("saber-train", "saber-train-%j.out", shell_name,
                              cmd, partition=partition)
    click.echo(f"wrote {path}")


@classifier_routines.command(name="prep2d-slurm")
@click.option("--input", required=True)
@click.option("--output", default="training_data.zarr", show_default=True)
@click.option("--sam2-cfg", default="small", show_default=True)
@click.option("--scale-factor", default=1.0, show_default=True)
@click.option("--min-mask-area", default=50, show_default=True)
@click.option("--shell-name", default="submit_prep2d.sh", show_default=True)
@click.option("--partition", default="tpu", show_default=True)
def prep2d_slurm_cmd(input, output, sam2_cfg, scale_factor, min_mask_area,
                     shell_name, partition):
    """Generate an sbatch script for micrograph training-data prep
    (reference classifier/preprocess/slurm.py
    prepare_micrograph_training_slurm:5-47)."""
    from saber_tpu.utils.slurm_submit import (create_shellsubmit,
                                              passthrough_command)
    cmd = passthrough_command("saber classifier prep2d", {
        "input": input, "output": output, "sam2_cfg": sam2_cfg,
        "scale_factor": scale_factor, "min_mask_area": min_mask_area})
    path = create_shellsubmit("saber-prep2d", "saber-prep2d-%j.out",
                              shell_name, cmd, partition=partition)
    click.echo(f"wrote {path}")


@classifier_routines.command(name="prep3d-slurm")
@click.option("--input", required=True)
@click.option("--output", default="training_data.zarr", show_default=True)
@click.option("--voxel-size", type=float, default=None)
@click.option("--sam2-cfg", default="small", show_default=True)
@click.option("--slab-thickness", default=10, show_default=True)
@click.option("--min-mask-area", default=50, show_default=True)
@click.option("--shell-name", default="submit_prep3d.sh", show_default=True)
@click.option("--partition", default="tpu", show_default=True)
def prep3d_slurm_cmd(input, output, voxel_size, sam2_cfg, slab_thickness,
                     min_mask_area, shell_name, partition):
    """Generate an sbatch script for tomogram training-data prep
    (reference classifier/preprocess/slurm.py
    prepare_tomogram_training_slurm:49-99)."""
    from saber_tpu.utils.slurm_submit import (create_shellsubmit,
                                              passthrough_command)
    cmd = passthrough_command("saber classifier prep3d", {
        "input": input, "output": output, "sam2_cfg": sam2_cfg,
        "slab_thickness": slab_thickness, "min_mask_area": min_mask_area,
        "voxel_size": voxel_size})
    path = create_shellsubmit("saber-prep3d", "saber-prep3d-%j.out",
                              shell_name, cmd, partition=partition)
    click.echo(f"wrote {path}")
