import numpy as np

from pseudoaligner_tpu.config import AlignerConfig
from pseudoaligner_tpu.models.aligner import Pseudoaligner
from pseudoaligner_tpu.ops.map_kernel import (
    device_index_from_image,
    pack_reads_host,
)
from pseudoaligner_tpu.ops.stats import batch_stats


def test_batch_stats(small_index, small_reads):
    import pytest

    cfg = AlignerConfig(k=20, batch_size=32, max_read_len=64, max_nodes=64)
    al = Pseudoaligner(small_index, cfg)
    B, L = 32, 64
    codes = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros(B, dtype=np.int32)
    for j, (_, c) in enumerate(small_reads[:B]):
        codes[j, : len(c)] = c
        lens[j] = len(c)
    packed = pack_reads_host(codes)
    # the serving upload strips the mphf/key arrays in cuckoo mode
    # (upload_device_index): stats must refuse it with a clear error
    with pytest.raises(ValueError, match="full DeviceIndex"):
        batch_stats(al.meta, al.dev, packed, lens)
    full_dev, _ = device_index_from_image(small_index, cfg)
    st = batch_stats(al.meta, full_dev, packed, lens)
    assert st.n_reads == B
    assert st.n_positions == int(np.maximum(lens - 20 + 1, 0).sum())
    assert 0 <= st.n_seed_hits <= st.n_positions
    # BBHash alien probes hit set bits at roughly the level densities;
    # verification (one key gather) resolves them — just bound sanity here
    assert 0.0 <= st.fp_rate < 0.7
    # ground truth hit count via the exact host map
    truth = 0
    from pseudoaligner_tpu.dna import pack_kmers
    from pseudoaligner_tpu.golden import GoldenAligner

    g = GoldenAligner(small_index)
    for j in range(B):
        if lens[j] < 20:
            continue
        from pseudoaligner_tpu.dna import kmer_to_pyint

        for kw in pack_kmers(codes[j, : lens[j]], 20):
            if kmer_to_pyint(kw) in g._kmer_map:
                truth += 1
    assert st.n_seed_hits == truth
