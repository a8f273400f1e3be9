"""DepthPipeline contract: deferral depths, FIFO order, fallback drain."""

from pseudoaligner_tpu.pipeline import DepthPipeline


def test_deferral_depths_and_order():
    log = []

    def prepare(item, nxt):
        log.append(("p", item, nxt))
        return item

    def finish(st):
        log.append(("f", st))

    pipe = DepthPipeline(2, prepare, finish)
    for i in range(6):
        pipe.push(i)
    # item k prepares only after k+1..k+2 are queued; finish(k) only
    # after prepares k+1..k+2 happened
    assert [e for e in log if e[0] == "p"] == [
        ("p", 0, 1), ("p", 1, 2), ("p", 2, 3), ("p", 3, 4)]
    assert [e for e in log if e[0] == "f"] == [("f", 0), ("f", 1)]
    pipe.close()
    assert [e[1] for e in log if e[0] == "p"] == list(range(6))
    assert [e[1] for e in log if e[0] == "f"] == list(range(6))
    # next_item peeks the following queue entry; the last sees None
    assert [e[2] for e in log if e[0] == "p"] == [1, 2, 3, 4, 5, None]


def test_none_prepare_skips_finish_and_drain_preserves_order():
    written = []

    def prepare(item, _nxt):
        if item % 2:
            # fallback path: force queued finishes out first, write direct
            pipe.drain_prepared()
            written.append(("direct", item))
            return None
        return item

    def finish(st):
        written.append(("finished", st))

    pipe = DepthPipeline(3, prepare, finish)
    for i in range(8):
        pipe.push(i)
    pipe.close()
    # output order == push order regardless of which stage wrote it
    assert [w[1] for w in written] == list(range(8))
    assert [w for w in written if w[1] % 2] == [
        ("direct", i) for i in range(1, 8, 2)]


def test_depth_floor_and_reuse():
    seen = []
    pipe = DepthPipeline(0, lambda i, _n: seen.append(i), None)
    pipe.push("a")
    pipe.push("b")  # depth clamps to 1: 'a' prepares when 'b' lands
    assert seen == ["a"]
    pipe.close()
    assert seen == ["a", "b"]
    pipe.push("c")  # reusable after close
    pipe.close()
    assert seen == ["a", "b", "c"]
