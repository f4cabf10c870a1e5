# TPU-ready image (reference: Dockerfile:1-7 shipped a python:3.8 CPU/TF
# image with a missing qbold_main.py entrypoint; this one actually runs).
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY qbold_vi_tpu ./qbold_vi_tpu
COPY configurations ./configurations

# On TPU VMs install jax[tpu] instead of plain jax.
RUN pip install --no-cache-dir .[io]

ENTRYPOINT ["python", "-m", "qbold_vi_tpu"]
CMD ["train", "--config", "configurations/optimal.yaml"]
