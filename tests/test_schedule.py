"""GAN alternation schedule unit tests (pure host logic).

Simulates the decision sequence the reference's train loop produces
(train.py:276-299, 357-359, 420-423) without running any compute.
"""

from gantron_tpu.config import HParams
from gantron_tpu.train.loop import advance_counters, is_disc_turn


def simulate(hp, n_steps, start=0):
    """Returns the list of 'G'/'D' decisions for iterations [start, start+n)."""
    gen_times, disc_times = 1, 0
    buffer_len = 0
    seq = []
    for iteration in range(start, start + n_steps):
        d = is_disc_turn(iteration, gen_times, disc_times, hp, buffer_len)
        seq.append("D" if d else "G")
        if not d:
            buffer_len = min(buffer_len + 1, max(hp.d_freq, 1))
        gen_times, disc_times = advance_counters(d, iteration, gen_times,
                                                 disc_times, hp)
    return "".join(seq)


def test_warmup_then_disc_phase_then_alternation():
    hp = HParams.create("disc_warmp_up=10,g_freq=2,d_freq=1")
    seq = simulate(hp, 24)
    # 6 G warm-up steps (iterations 0..5; is_disc_turn needs iteration > 5),
    # then D-only until disc_warmp_up, one last D at 10, then G G D cycles.
    assert seq.startswith("GGGGGG")
    assert seq[6:11] == "DDDDD"
    assert seq[11:23] == "GGD" * 4


def test_d_freq_zero_means_generator_only():
    hp = HParams.create("d_freq=0,disc_warmp_up=0")
    assert simulate(hp, 30) == "G" * 30


def test_g_freq_3_pattern():
    hp = HParams.create("disc_warmp_up=8,g_freq=3,d_freq=1")
    seq = simulate(hp, 30)
    tail = seq[9:]  # after warm-ups
    assert tail.startswith("GGGD" * 5)


def test_disc_burst_every_10k():
    hp = HParams.create("disc_warmp_up=500,g_freq=2,d_freq=1")
    # Around iteration 10_000 the discriminator trains for 100 consecutive
    # steps (reference train.py:297-299).
    gen_times, disc_times, buffer_len = 1, 0, 1
    seq = []
    for iteration in range(9995, 10105):
        d = is_disc_turn(iteration, gen_times, disc_times, hp, buffer_len)
        seq.append("D" if d else "G")
        gen_times, disc_times = advance_counters(d, iteration, gen_times,
                                                 disc_times, hp)
    s = "".join(seq)
    burst = s[5:105]  # iterations 10000..10099
    assert burst == "D" * 100
    # Alternation resumes after the burst.
    assert "G" in s[105:]


def test_no_disc_without_generated_mel():
    hp = HParams.create("disc_warmp_up=10,g_freq=2,d_freq=1")
    # Even in the D window, an empty fake buffer forces a G step.
    assert not is_disc_turn(7, 1, 0, hp, buffer_len=0)
    assert is_disc_turn(7, 1, 0, hp, buffer_len=1)


def test_hparams_list_overrides_parse():
    """List-valued --hparams (bucket/mesh fields) must parse: a naive
    split(',') crashed on every multi-element list."""
    from gantron_tpu.config import HParams

    hp = HParams.create(
        "mel_buckets=[240,480],batch_size=8,text_buckets=[16,32],"
        "mesh_shape=[2,4],use_noise=True")
    assert hp.mel_buckets == [240, 480]
    assert hp.text_buckets == [16, 32]
    assert hp.mesh_shape == [2, 4]
    assert hp.batch_size == 8 and hp.use_noise is True


def test_hparams_path_list_overrides_parse():
    """Path values never go through literal_eval (reference hparams.py:121),
    so list-of-paths fields need type-aware coercion: both bracket syntax
    and a bare single path must land as real lists (the reference cannot
    set training_files from the CLI at all)."""
    from gantron_tpu.config import ClassifierHParams, HParams

    hp = HParams.create(
        "training_files=[/tmp/a.txt,/tmp/b.txt],validation_files=/tmp/v.txt,"
        "batch_size=4")
    assert hp.training_files == ["/tmp/a.txt", "/tmp/b.txt"]
    assert hp.validation_files == ["/tmp/v.txt"]
    assert hp.batch_size == 4
    # Non-list str fields must NOT be coerced.
    hp.add_params_string("vesus_path=/data/vesus/")
    assert hp.vesus_path == "/data/vesus/"

    chp = ClassifierHParams.create("training_files=[/x/t.txt]")
    assert chp.training_files == ["/x/t.txt"]
