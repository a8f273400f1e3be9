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


def test_render_stage_order_and_threading():
    """render runs on ONE worker thread (submission order = completion
    order), finish receives rendered values strictly FIFO, and
    render-side mutations stay ordered."""
    import threading

    order = []
    main = threading.current_thread()
    threads = set()

    def render(item):
        order.append(item)
        threads.add(threading.current_thread())
        return item * 10

    got = []
    pipe = DepthPipeline(2, lambda i, _n: i, got.append, render=render)
    for i in range(7):
        pipe.push(i)
    pipe.close()
    assert got == [i * 10 for i in range(7)]
    assert order == list(range(7))  # single worker -> submission order
    assert len(threads) == 1 and main not in threads


def test_render_error_reraises_at_ordered_finish():
    import pytest

    def render(item):
        if item == 2:
            raise RuntimeError("boom")
        return item

    got = []
    pipe = DepthPipeline(1, lambda i, _n: i, got.append, render=render)
    with pytest.raises(RuntimeError, match="boom"):
        for i in range(5):
            pipe.push(i)
        pipe.close()
    assert got == [0, 1]  # everything before the failing item landed


def test_abort_drops_queued_work():
    rendered = []
    got = []
    pipe = DepthPipeline(3, lambda i, _n: i, got.append,
                         render=rendered.append)
    for i in range(4):
        pipe.push(i)
    pipe.abort()
    # nothing new runs after abort; no finishes were forced out
    n_r = len(rendered)
    assert got == []
    pipe.abort()  # idempotent
    assert len(rendered) == n_r


def test_prefetch_iter_protocol_and_close():
    from pseudoaligner_tpu.pipeline import prefetch_iter

    pf = prefetch_iter(iter(range(5)), depth=2)
    assert list(pf) == list(range(5))
    import pytest

    with pytest.raises(StopIteration):  # exhausted stays exhausted
        next(pf)
    with pytest.raises(StopIteration):
        next(pf)

    # errors propagate in order, after the preceding items
    def gen():
        yield 1
        yield 2
        raise ValueError("reader died")

    pf = prefetch_iter(gen())
    assert next(pf) == 1
    assert next(pf) == 2
    with pytest.raises(ValueError, match="reader died"):
        next(pf)

    # close() joins the worker even when the consumer abandons mid-way
    import threading

    started = threading.Event()
    release = threading.Event()

    def slow():
        for i in range(100):
            started.set()
            release.wait(5)
            yield i

    pf = prefetch_iter(slow(), depth=1)
    started.wait(5)
    release.set()
    assert next(pf) == 0
    pf.close()
    assert not pf._thread.is_alive()
