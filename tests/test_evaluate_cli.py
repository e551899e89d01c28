"""End-to-end evaluate CLI: converter + GloVe + full protocol together.

VERDICT r1 missing #2/#3: drive ``tools.evaluate.main`` on a committed
tiny fixture corpus with (a) a real-shaped ``finest.tar`` evaluator
checkpoint consumed by the converter and (b) the real GloVe
``WordVectorizer`` path reading the committed 29-word fixture — the full
2-replication Guo protocol (``text2motion/tools/evaluation.py``).
"""

import os

import numpy as np
import pytest

FIXTURE_GLOVE = os.path.join(os.path.dirname(__file__), "fixtures", "glove")


class TestWordVectorizerRealPath:
    def test_glove_fixture_loads(self):
        from motiondiffusion_moe_tpu.eval import get_word_vectorizer
        from motiondiffusion_moe_tpu.eval.word_vectorizer import (
            WordVectorizer)

        wv = get_word_vectorizer(FIXTURE_GLOVE)
        assert isinstance(wv, WordVectorizer)  # NOT the hashed fallback
        assert len(wv) == 29

    def test_lookup_and_pos(self):
        from motiondiffusion_moe_tpu.eval.word_vectorizer import (
            POS_enumerator, WordVectorizer)

        wv = WordVectorizer(FIXTURE_GLOVE)
        vec, pos = wv["person/NOUN"]
        assert vec.shape == (300,) and pos.shape == (15,)
        assert pos[POS_enumerator["NOUN"]] == 1

        # VIP class overrides the tagged POS (word_vectorizer.py:66-73)
        _, pos_vip = wv["left/NOUN"]
        assert pos_vip[POS_enumerator["Loc_VIP"]] == 1
        _, pos_walk = wv["walk/VERB"]
        assert pos_walk[POS_enumerator["Act_VIP"]] == 1

        # OOV -> unk vector + OTHER one-hot
        unk_vec, unk_pos = wv["xyzzy/VERB"]
        np.testing.assert_array_equal(unk_vec, wv.word2vec["unk"])
        assert unk_pos[POS_enumerator["OTHER"]] == 1

        # same word, different entries share the same vector
        v1, _ = wv["walks/VERB"]
        v2, _ = wv["walks/NOUN"]
        np.testing.assert_array_equal(v1, v2)


def _save_finest_tar(path: str, dim_pose: int) -> None:
    """A real-shaped finest.tar (layout of datasets1/evaluator_models.py)."""
    import torch
    from torch import nn as tnn

    torch.manual_seed(7)
    mov = tnn.Module()
    mov.main = tnn.Sequential(
        tnn.Conv1d(dim_pose - 4, 512, 4, 2, 1), tnn.Dropout(0.2),
        tnn.LeakyReLU(0.2), tnn.Conv1d(512, 512, 4, 2, 1),
        tnn.Dropout(0.2), tnn.LeakyReLU(0.2))
    mov.out_net = tnn.Linear(512, 512)

    def bigru_co(input_size, hidden, with_pos):
        m = tnn.Module()
        if with_pos:
            m.pos_emb = tnn.Linear(15, 300)
        m.input_emb = tnn.Linear(input_size, hidden)
        m.gru = tnn.GRU(hidden, hidden, batch_first=True, bidirectional=True)
        m.output_net = tnn.Sequential(
            tnn.Linear(hidden * 2, hidden), tnn.LayerNorm(hidden),
            tnn.LeakyReLU(0.2), tnn.Linear(hidden, 512))
        m.hidden = tnn.Parameter(torch.randn(2, 1, hidden))
        return m

    torch.save({"movement_encoder": mov.state_dict(),
                "text_encoder": bigru_co(300, 512, True).state_dict(),
                "motion_encoder": bigru_co(512, 1024, False).state_dict()},
               path)


@pytest.mark.slow
class TestServingQualityCLI:
    def test_table_on_trained_checkpoint(self, tmp_path, capsys):
        """tools/serving_quality end-to-end on a tiny trained run: all
        solver/dtype variants sample device-resident, stats come back as
        one scalar fetch, and the table + bf16 drift lines print. (The
        tool's device-side discipline exists for the remote-chip tunnel —
        BENCH_NOTES.md round-5 — but the math is backend-agnostic.)"""
        from motiondiffusion_moe_tpu.tools.serving_quality import (
            main as sq_main)
        from motiondiffusion_moe_tpu.tools.train import main as train_main

        train_main([
            "--name", "sqrun", "--dataset", "synthetic",
            "--synthetic_size", "8", "--checkpoint_dir", str(tmp_path),
            "--batch_size", "4", "--num_epochs", "1",
            "--num_layers", "1", "--latent_dim", "32", "--ff_size", "16",
            "--num_heads", "2", "--num_experts", "4",
            "--text_latent_dim", "16", "--diffusion_steps", "50",
            "--no_uncond_step", "--ema_decay", "0.9",
        ])
        sq_main(["--run_dir", str(tmp_path / "sqrun"), "--use_ema",
                 "--batch", "4"])
        out = capsys.readouterr().out
        assert "restored step" in out and "on host" in out
        for name in ("ddim50", "dpm20", "dpm10", "ddim50-bf16",
                     "dpm20-bf16"):
            assert f"\n{name} " in out, (name, out[-1500:])
        assert out.count("bf16 drift") == 2
        # every variant validated finite on device
        assert out.count("checksum") == 6  # ref + 5 variants


@pytest.mark.slow
class TestEvaluateCLIEndToEnd:
    def test_full_protocol(self, tmp_path, capsys):
        """Train 1 tiny epoch through the train CLI, then run the full
        evaluate CLI: converter-loaded evaluator, fixture GloVe, 2
        replications, joint-space scores."""
        from motiondiffusion_moe_tpu.tools.evaluate import main as eval_main
        from motiondiffusion_moe_tpu.tools.train import main as train_main

        train_main([
            "--name", "evalrun", "--dataset", "synthetic",
            "--synthetic_size", "8", "--checkpoint_dir", str(tmp_path),
            "--batch_size", "4", "--num_epochs", "1",
            "--num_layers", "1", "--latent_dim", "32", "--ff_size", "16",
            "--num_heads", "2", "--num_experts", "4",
            "--text_latent_dim", "16", "--diffusion_steps", "50",
            "--no_uncond_step",
        ])
        run_dir = str(tmp_path / "evalrun")

        finest = str(tmp_path / "finest.tar")
        _save_finest_tar(finest, dim_pose=263)

        eval_main([
            "--run_dir", run_dir, "--dataset", "synthetic",
            "--max_samples", "12", "--batch_size", "4",
            "--evaluator_ckpt", finest,
            "--glove_dir", FIXTURE_GLOVE,
            "--sampler", "ddim", "--steps", "5",
            "--replication_times", "2",
            "--mm_num_samples", "4", "--mm_num_repeats", "3",
            "--mm_num_times", "2", "--diversity_times", "4",
        ])
        out = capsys.readouterr().out
        assert "loaded evaluator weights" in out
        assert "hashed word vectors" not in out     # real GloVe path ran
        assert "MAE=" in out                        # joint-space scores ran

        log = (tmp_path / "evalrun" / "evaluation.log").read_text()
        # the protocol summary lines (metrics.py / protocol.py)
        for key in ("FID", "Diversity", "R_precision", "MultiModality",
                    "Matching"):
            assert key.lower() in log.lower(), (key, log[-2000:])

    def test_mesh_sharded_eval(self, tmp_path, capsys):
        """--data_parallel/--expert_parallel shard the eval-time sampling
        pipeline (the v5e-8 eval shape) through the real CLI."""
        from motiondiffusion_moe_tpu.tools.evaluate import main as eval_main
        from motiondiffusion_moe_tpu.tools.train import main as train_main

        train_main([
            "--name", "meshrun", "--dataset", "synthetic",
            "--synthetic_size", "8", "--checkpoint_dir", str(tmp_path),
            "--batch_size", "4", "--num_epochs", "1",
            "--num_layers", "1", "--latent_dim", "32", "--ff_size", "16",
            "--num_heads", "2", "--num_experts", "4",
            "--text_latent_dim", "16", "--diffusion_steps", "50",
            "--no_uncond_step",
        ])
        eval_main([
            "--run_dir", str(tmp_path / "meshrun"),
            "--dataset", "synthetic",
            "--max_samples", "8", "--batch_size", "4",
            "--data_parallel", "2", "--expert_parallel", "2",
            "--sampler", "ddim", "--steps", "5",
            "--replication_times", "1",
            "--mm_num_samples", "4", "--mm_num_repeats", "3",
            "--mm_num_times", "2", "--diversity_times", "2",
            "--score_samples", "4",
        ])
        out = capsys.readouterr().out
        assert "mesh {'data': 2, 'expert': 2, 'model': 1}" in out
        assert "MAE=" in out
