"""Evaluation suite tests: metrics math, BiGRU packed-sequence parity with
torch, evaluator wrapper, protocol plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.eval import (
    EvalSample,
    EvaluatorModelWrapper,
    HashedWordVectorizer,
    MaskedBiGRU,
    ProtocolConfig,
    build_generated_samples,
    calculate_R_precision,
    calculate_activation_statistics,
    calculate_diversity,
    calculate_frechet_distance,
    calculate_multimodality,
    calculate_top_k,
    euclidean_distance_matrix,
    evaluation,
    get_metric_statistics,
    make_batches,
    score_mae_velocity_jerk,
    snap_length,
)


class TestMetrics:
    def test_euclidean_distance_matrix(self):
        a = np.asarray([[0.0, 0.0], [1.0, 0.0]])
        b = np.asarray([[0.0, 0.0], [0.0, 2.0]])
        d = euclidean_distance_matrix(a, b)
        np.testing.assert_allclose(d, [[0, 2], [1, np.sqrt(5)]], atol=1e-6)

    def test_top_k_and_r_precision(self):
        emb = np.eye(4).astype(np.float64)
        # identical embeddings -> every query's nearest is itself
        r = calculate_R_precision(emb, emb, top_k=3, sum_all=True)
        assert r[0] == 4  # top-1 all correct
        assert (np.diff(r) >= 0).all()  # cumulative

    def test_fid_zero_for_identical(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((500, 8))
        mu, cov = calculate_activation_statistics(x)
        fid = calculate_frechet_distance(mu, cov, mu, cov)
        assert abs(fid) < 1e-6

    def test_fid_positive_for_shifted(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((500, 8))
        y = x + 3.0
        mu1, cov1 = calculate_activation_statistics(x)
        mu2, cov2 = calculate_activation_statistics(y)
        fid = calculate_frechet_distance(mu1, cov1, mu2, cov2)
        assert fid == pytest.approx(9.0 * 8, rel=0.01)  # ||3||^2 per dim

    def test_diversity_scales_with_spread(self):
        rng = np.random.default_rng(0)
        tight = rng.standard_normal((400, 8)) * 0.1
        wide = rng.standard_normal((400, 8)) * 10
        r = np.random.default_rng(1)
        assert calculate_diversity(wide, 300, rng=r) > \
            calculate_diversity(tight, 300, rng=np.random.default_rng(1))

    def test_multimodality(self):
        rng = np.random.default_rng(0)
        act = rng.standard_normal((5, 20, 8))
        mm = calculate_multimodality(act, 10, rng=rng)
        assert mm > 0

    def test_metric_statistics(self):
        vals = np.asarray([1.0, 2.0, 3.0, 4.0])
        mean, ci = get_metric_statistics(vals, 4)
        assert mean == pytest.approx(2.5)
        assert ci == pytest.approx(1.96 * np.std(vals) / 2)


class TestMaskedBiGRUvsTorch:
    def test_packed_sequence_parity(self):
        """Our masked-scan BiGRU must match torch's pack_padded_sequence GRU
        final hidden states bit-for-bit (to f32 tolerance) on ragged
        lengths — the subtle trap SURVEY.md §7 hard-part 6 warns about."""
        import torch

        B, T, Din, H = 4, 10, 6, 8
        lengths = np.asarray([10, 7, 5, 2])
        rng = np.random.default_rng(0)
        x = rng.standard_normal((B, T, Din)).astype(np.float32)

        tgru = torch.nn.GRU(Din, H, batch_first=True, bidirectional=True)
        h0 = torch.randn(2, B, H)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths.tolist(), batch_first=True)
        with torch.no_grad():
            gru_seq, gru_last = tgru(packed, h0)
        torch_last = torch.cat([gru_last[0], gru_last[1]], dim=-1).numpy()

        m = MaskedBiGRU(hidden_size=H)
        sd = tgru.state_dict()
        params = {"params": {
            "fwd_w_ih": jnp.asarray(sd["weight_ih_l0"].numpy()),
            "fwd_w_hh": jnp.asarray(sd["weight_hh_l0"].numpy()),
            "fwd_b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
            "fwd_b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
            "bwd_w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].numpy()),
            "bwd_w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].numpy()),
            "bwd_b_ih": jnp.asarray(sd["bias_ih_l0_reverse"].numpy()),
            "bwd_b_hh": jnp.asarray(sd["bias_hh_l0_reverse"].numpy()),
        }}
        _, ours_last = m.apply(params, jnp.asarray(x), jnp.asarray(lengths),
                               jnp.asarray(h0.numpy()))
        np.testing.assert_allclose(np.asarray(ours_last), torch_last,
                                   atol=1e-5)

    def test_seq_outputs_aligned(self):
        """Padded-seq parity too: valid frames of the unpacked torch output
        match ours."""
        import torch

        B, T, Din, H = 3, 6, 4, 5
        lengths = np.asarray([6, 4, 3])
        rng = np.random.default_rng(1)
        x = rng.standard_normal((B, T, Din)).astype(np.float32)
        tgru = torch.nn.GRU(Din, H, batch_first=True, bidirectional=True)
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), lengths.tolist(), batch_first=True)
        with torch.no_grad():
            seq_packed, _ = tgru(packed, torch.zeros(2, B, H))
        seq_torch, _ = torch.nn.utils.rnn.pad_packed_sequence(
            seq_packed, batch_first=True, total_length=T)
        seq_torch = seq_torch.numpy()

        m = MaskedBiGRU(hidden_size=H)
        sd = tgru.state_dict()
        params = {"params": {
            "fwd_w_ih": jnp.asarray(sd["weight_ih_l0"].numpy()),
            "fwd_w_hh": jnp.asarray(sd["weight_hh_l0"].numpy()),
            "fwd_b_ih": jnp.asarray(sd["bias_ih_l0"].numpy()),
            "fwd_b_hh": jnp.asarray(sd["bias_hh_l0"].numpy()),
            "bwd_w_ih": jnp.asarray(sd["weight_ih_l0_reverse"].numpy()),
            "bwd_w_hh": jnp.asarray(sd["weight_hh_l0_reverse"].numpy()),
            "bwd_b_ih": jnp.asarray(sd["bias_ih_l0_reverse"].numpy()),
            "bwd_b_hh": jnp.asarray(sd["bias_hh_l0_reverse"].numpy()),
        }}
        seq_ours, _ = m.apply(params, jnp.asarray(x), jnp.asarray(lengths))
        seq_ours = np.asarray(seq_ours)
        # FULL-length parity, padded frames included: pad_packed_sequence
        # yields zeros at t >= length, and unmasked consumers (AttLayer
        # softmax) see those positions, so they must match too
        np.testing.assert_allclose(seq_ours, seq_torch, atol=1e-5)
        for i, L in enumerate(lengths):
            assert np.all(seq_ours[i, L:] == 0.0)


class TestFinestTarConverter:
    """Convert a REAL-shaped ``finest.tar`` checkpoint and assert text/motion
    co-embedding parity against the torch originals (VERDICT r1 missing #2).

    The torch modules are reconstructed here at the protocol's full dims so
    the saved state_dict has exactly the released checkpoint's layout
    (``datasets1/evaluator_models.py:79-98,311-386``: movement conv keys
    ``main.0``/``main.3``/``out_net``, BiGRU keys ``gru.weight_ih_l0`` etc.,
    ``hidden`` init parameter, ``output_net.{0,1,3}``)."""

    @pytest.mark.slow
    def test_convert_and_co_embedding_parity(self, tmp_path):
        import torch
        from torch import nn as tnn
        from torch.nn.utils.rnn import pack_padded_sequence

        dim_pose, dim_word, dim_pos = 263, 300, 15
        mov_latent, text_hidden, motion_hidden, co_dim = 512, 512, 1024, 512

        class TorchMovementEnc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.main = tnn.Sequential(
                    tnn.Conv1d(dim_pose - 4, 512, 4, 2, 1),
                    tnn.Dropout(0.2), tnn.LeakyReLU(0.2),
                    tnn.Conv1d(512, mov_latent, 4, 2, 1),
                    tnn.Dropout(0.2), tnn.LeakyReLU(0.2))
                self.out_net = tnn.Linear(mov_latent, mov_latent)

            def forward(self, x):
                return self.out_net(
                    self.main(x.permute(0, 2, 1)).permute(0, 2, 1))

        class TorchBiGRUCo(tnn.Module):
            """Text/motion co-encoder skeleton (text adds pos_emb)."""

            def __init__(self, input_size, hidden, with_pos):
                super().__init__()
                if with_pos:
                    self.pos_emb = tnn.Linear(dim_pos, dim_word)
                self.input_emb = tnn.Linear(input_size, hidden)
                self.gru = tnn.GRU(hidden, hidden, batch_first=True,
                                   bidirectional=True)
                self.output_net = tnn.Sequential(
                    tnn.Linear(hidden * 2, hidden), tnn.LayerNorm(hidden),
                    tnn.LeakyReLU(0.2), tnn.Linear(hidden, co_dim))
                self.hidden = tnn.Parameter(torch.randn(2, 1, hidden))

            def forward(self, inputs, lens, pos_onehot=None):
                if pos_onehot is not None:
                    inputs = inputs + self.pos_emb(pos_onehot)
                embs = self.input_emb(inputs)
                h0 = self.hidden.repeat(1, inputs.shape[0], 1)
                packed = pack_padded_sequence(embs, list(lens),
                                              batch_first=True)
                _, last = self.gru(packed, h0)
                return self.output_net(
                    torch.cat([last[0], last[1]], dim=-1))

        torch.manual_seed(0)
        mov = TorchMovementEnc().eval()
        txt = TorchBiGRUCo(dim_word, text_hidden, with_pos=True).eval()
        mot = TorchBiGRUCo(mov_latent, motion_hidden, with_pos=False).eval()

        path = str(tmp_path / "finest.tar")
        torch.save({"movement_encoder": mov.state_dict(),
                    "text_encoder": txt.state_dict(),
                    "motion_encoder": mot.state_dict()}, path)

        # ---- torch reference co-embeddings (evaluator.py:449-479 flow)
        rng = np.random.default_rng(0)
        B, T_m, T_w = 3, 48, 10
        motions = rng.standard_normal((B, T_m, dim_pose)).astype(np.float32)
        m_lens = np.asarray([48, 36, 24])          # sorted for pack_padded
        word_embs = rng.standard_normal((B, T_w, dim_word)).astype(np.float32)
        pos_ohot = rng.standard_normal((B, T_w, dim_pos)).astype(np.float32)
        cap_lens = np.asarray([10, 7, 4])
        with torch.no_grad():
            movements = mov(torch.from_numpy(motions[..., :-4]))
            t_me = mot(movements, m_lens // 4).numpy()
            t_te = txt(torch.from_numpy(word_embs), cap_lens,
                       torch.from_numpy(pos_ohot)).numpy()

        # ---- converted flax wrapper
        w = EvaluatorModelWrapper.from_torch_checkpoint(path,
                                                        dim_pose=dim_pose)
        j_te, j_me = w.get_co_embeddings(word_embs, pos_ohot, cap_lens,
                                         motions, m_lens)
        np.testing.assert_allclose(j_te, t_te, atol=1e-3)
        np.testing.assert_allclose(j_me, t_me, atol=1e-3)


class TestEvaluatorWrapper:
    @pytest.mark.slow
    def test_embeddings_shapes(self):
        w = EvaluatorModelWrapper(dim_pose=263)
        B, T = 3, 32
        motions = np.random.default_rng(0).standard_normal(
            (B, T, 263)).astype(np.float32)
        m_lens = np.asarray([32, 24, 16], np.int32)
        emb = w.get_motion_embeddings(motions, m_lens)
        assert emb.shape == (3, 512)
        word_embs = np.zeros((B, 22, 300), np.float32)
        pos = np.zeros((B, 22, 15), np.float32)
        te, me = w.get_co_embeddings(word_embs, pos,
                                     np.asarray([5, 7, 9]), motions, m_lens)
        assert te.shape == (3, 512) and me.shape == (3, 512)
        assert np.isfinite(te).all() and np.isfinite(me).all()

    def test_length_matters(self):
        """Different m_lens must change the embedding (packed semantics)."""
        w = EvaluatorModelWrapper(dim_pose=263)
        motions = np.random.default_rng(0).standard_normal(
            (1, 64, 263)).astype(np.float32)
        e1 = w.get_motion_embeddings(motions, np.asarray([64]))
        e2 = w.get_motion_embeddings(motions, np.asarray([32]))
        assert np.abs(e1 - e2).max() > 1e-4


class TestProtocol:
    def _samples(self, n=8, D=263):
        rng = np.random.default_rng(0)
        return [EvalSample(
            caption=f"a person walks {i}",
            tokens=["a/DET", "person/NOUN", "walks/VERB"],
            motion=rng.standard_normal((196, D)).astype(np.float32) * 0.1,
            m_length=int(rng.integers(40, 196))) for i in range(n)]

    def test_snap_length(self):
        assert snap_length(55) == 52          # floor to unit 4
        assert snap_length(10) == 40          # min 10 units
        assert snap_length(500) == 196        # cap

    def test_make_batches(self):
        samples = self._samples(5)
        wv = HashedWordVectorizer()
        # ragged tail DROPPED (reference eval loaders use drop_last=True;
        # a smaller retrieval pool would bias R-precision)
        batches = make_batches(samples, wv, batch_size=2)
        assert len(batches) == 2
        assert all(b.word_embs.shape == (2, 22, 300) for b in batches)
        assert batches[0].pos_ohots.shape == (2, 22, 15)
        # whole set smaller than one batch: kept as a single ragged batch
        batches = make_batches(samples, wv, batch_size=8)
        assert len(batches) == 1 and batches[0].word_embs.shape[0] == 5

    def test_build_generated_samples(self):
        samples = self._samples(6)

        def fake_generate(captions, lens, seed):
            rng = np.random.default_rng(seed)
            return [rng.standard_normal((L, 263)).astype(np.float32)
                    for L in lens]

        gen, (mm_motions, mm_lens) = build_generated_samples(
            samples, fake_generate, mm_num_samples=2, mm_num_repeats=3)
        assert len(gen) == 6
        assert mm_motions.shape == (2, 3, 196, 263)
        assert (mm_lens > 0).all()

    @pytest.mark.slow
    def test_full_protocol_smoke(self, tmp_path):
        """End-to-end protocol on tiny sizes with a fake generator and a
        random-init evaluator: all five metrics come out finite."""
        samples = self._samples(8)
        wv = HashedWordVectorizer()
        wrapper = EvaluatorModelWrapper(dim_pose=263)

        def fake_generate(captions, lens, seed):
            rng = np.random.default_rng(seed)
            return [rng.standard_normal((L, 263)).astype(np.float32) * 0.1
                    for L in lens]

        cfg = ProtocolConfig(mm_num_samples=2, mm_num_repeats=3,
                             mm_num_times=2, diversity_times=4,
                             replication_times=2, batch_size=4)
        summary = evaluation(samples, fake_generate, wrapper, wv,
                             str(tmp_path / "log.txt"), cfg)
        for metric in ("Matching Score", "FID", "Diversity", "MultiModality"):
            for model, (mean, ci) in summary[metric].items():
                assert np.isfinite(mean).all(), metric

    def test_embedding_path_matches_host_path(self, tmp_path):
        """evaluation(embed_generate=...) — the device-embedded protocol —
        must reproduce the host-path metrics exactly: same caption/mm
        schedule, same rng consumption, same pools."""
        samples = self._samples(8)
        wv = HashedWordVectorizer()
        wrapper = EvaluatorModelWrapper(dim_pose=263)

        def fake_generate(captions, lens, seed):
            rng = np.random.default_rng(seed)
            return [rng.standard_normal((L, 263)).astype(np.float32) * 0.1
                    for L in lens]

        def embed_generate(captions, lens, seed):
            outs = fake_generate(captions, lens, seed)
            padded = np.zeros((len(outs), 196, 263), np.float32)
            for i, o in enumerate(outs):
                padded[i, : o.shape[0]] = o[:196]
            return wrapper.get_motion_embeddings(
                padded, np.asarray(lens, np.int64))

        cfg = ProtocolConfig(mm_num_samples=2, mm_num_repeats=3,
                             mm_num_times=2, diversity_times=4,
                             replication_times=1, batch_size=4)
        host = evaluation(samples, fake_generate, wrapper, wv,
                          str(tmp_path / "host.txt"), cfg)
        dev = evaluation(samples, None, wrapper, wv,
                         str(tmp_path / "dev.txt"), cfg,
                         embed_generate=embed_generate)
        for metric in host:
            for name in host[metric]:
                np.testing.assert_allclose(
                    np.asarray(host[metric][name][0]),
                    np.asarray(dev[metric][name][0]),
                    rtol=2e-4, atol=1e-5,
                    err_msg=f"{metric}/{name}")

    def test_score_mae_velocity_jerk(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((4, 32, 22, 3))
        mae, vel, jerk, pae = score_mae_velocity_jerk(a, a)
        assert mae.max() == 0 and vel == 0 and jerk == 0
        b = a + rng.standard_normal(a.shape) * 0.1
        mae, vel, jerk, _ = score_mae_velocity_jerk(b, a)
        assert mae.mean() > 0 and vel > 0 and jerk > 0
