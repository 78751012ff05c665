"""SLURM sbatch script generation (reference saber/utils/slurm_submit.py).

Cluster fan-out = generate a shell script the user submits; jobs are
independent (no inter-job communication, SURVEY.md §2c.4). TPU variant:
the generated script requests TPU-host partitions and each job drives all
chips on its host through the DevicePool; multi-host meshes initialize
jax.distributed from SLURM env vars.
"""

import os
import shlex
import stat
from typing import Optional


def passthrough_command(base: str, opts: dict) -> str:
    """Render a CLI invocation from option name→value pairs: None/False
    skipped, True rendered as a bare flag, everything else shell-quoted.
    Shared by every slurm verb so quoting cannot diverge per verb."""
    parts = [base]
    for k, v in opts.items():
        if v is None or v is False:
            continue
        flag = "--" + k.replace("_", "-")
        if v is True:
            parts.append(flag)
        else:
            parts.append(f"{flag} {shlex.quote(str(v))}")
    return " ".join(parts)


def create_shellsubmit(job_name: str, output_file: str, shell_name: str,
                       command: str, partition: str = "tpu",
                       num_chips: int = 8, walltime: str = "18:00:00",
                       cpus: int = 6, mem_per_cpu: str = "16G",
                       conda_env: Optional[str] = None) -> str:
    """Write an sbatch script wrapping ``command``
    (reference slurm_submit.py:13-43)."""
    env_line = f"conda activate {conda_env}" if conda_env else ""
    script = f"""#!/bin/bash
#SBATCH --job-name={job_name}
#SBATCH --output={output_file}
#SBATCH --partition={partition}
#SBATCH --time={walltime}
#SBATCH --cpus-per-task={cpus}
#SBATCH --mem-per-cpu={mem_per_cpu}
#SBATCH --gres=tpu:{num_chips}

{env_line}
# multi-host meshes pick these up via jax.distributed
export SLURM_MESH_COORDINATOR=${{SLURM_JOB_NODELIST%%,*}}:12345

{command}
"""
    with open(shell_name, "w") as f:
        f.write(script)
    os.chmod(shell_name, os.stat(shell_name).st_mode | stat.S_IEXEC)
    return shell_name
