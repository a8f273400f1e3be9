import os
import sys

# Tests run on a virtual 8-device CPU mesh (multi-chip shardings are
# validated without TPU hardware; the driver separately dry-runs the
# multi-chip path, and bench.py runs on the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin (registered by sitecustomize in this image) pins the
# platform to the single tunneled TPU chip regardless of JAX_PLATFORMS in
# the environment; force CPU in-process so tests run on the virtual
# 8-device CPU mesh and never claim (or block on) the TPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_FASTA = "/root/reference/test/gencode_small.fa"
REF_FASTQ = "/root/reference/test/small.fq"


@pytest.fixture(scope="session")
def transcripts():
    from pseudoaligner_tpu.io.fasta import read_transcripts

    return read_transcripts(REF_FASTA)


@pytest.fixture(scope="session")
def small_transcripts(transcripts):
    """First 100 transcripts — fast-build subset for unit-level checks."""
    seqs, names, gene_map = transcripts
    names = names[:100]
    return seqs[:100], names, {n: gene_map[n] for n in names}


@pytest.fixture(scope="session")
def small_index(small_transcripts):
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = small_transcripts
    return build_index(seqs, names, gene_map, k=20)


@pytest.fixture(scope="session")
def full_index(transcripts):
    from pseudoaligner_tpu.index.builder import build_index

    seqs, names, gene_map = transcripts
    return build_index(seqs, names, gene_map, k=20)


@pytest.fixture(scope="session")
def small_reads():
    from pseudoaligner_tpu.io.fastq import read_fastq_records
    from pseudoaligner_tpu.dna import encode_bases

    out = []
    for rid, seq in read_fastq_records(REF_FASTQ):
        codes = encode_bases(seq)
        out.append((rid, np.where(codes == 255, 0, codes)))
    return out
