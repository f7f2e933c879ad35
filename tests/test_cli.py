"""End-to-end CLI pipeline on a tiny config: train -> checkpoint/resume ->
generate dataset -> solve -> compare (the reference's full workflow,
train.sh:4-13). CLIs run in-process so all stages share one JIT cache."""

import json
import os
import pickle

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli_e2e"))


@pytest.fixture(autouse=True)
def in_workdir(workdir, monkeypatch):
    monkeypatch.chdir(workdir)


TRAIN_ARGS = [
    "--env", "lightsout3", "--nnet_name", "lo3", "--back_max", "2",
    "--batch_size", "128", "--states_per_update", "512", "--loss_thresh",
    "5.0", "--num_test", "12", "--h1_dim", "32", "--resnet_dim", "16",
    "--num_resnet_blocks", "1", "--debug", "--seed", "0",
]


def test_train_solve_compare_pipeline(workdir, capsys):
    from deepcubea_tpu.cli import compare, generate_dataset, solve, train

    # train 2 updates (8 itrs)
    train.main(TRAIN_ARGS + ["--max_itrs", "8"])
    out = capsys.readouterr().out
    assert "Updating target network" in out
    ckpt = os.path.join(workdir, "saved_models", "lo3", "current")
    assert os.path.isfile(os.path.join(ckpt, "model.msgpack"))
    with open(os.path.join(ckpt, "meta.json")) as f:
        assert json.load(f)["itr"] == 8

    # resume picks up where it left off
    train.main(TRAIN_ARGS + ["--max_itrs", "12"])
    out = capsys.readouterr().out
    assert "resumed" in out
    with open(os.path.join(ckpt, "meta.json")) as f:
        assert json.load(f)["itr"] == 12

    # dataset
    generate_dataset.main(["--env", "lightsout3", "--back_max", "3",
                           "--num_per_file", "8", "--num_files", "1",
                           "--save_dir", "testset"])
    with open(os.path.join(workdir, "testset", "data_0.pkl"), "rb") as f:
        ds = pickle.load(f)
    assert ds["states"].shape == (8, 9)

    # solve
    solve.main(["--states", "testset/data_0.pkl", "--model",
                "saved_models/lo3/current", "--env", "lightsout3",
                "--weight", "1.0", "--batch_size", "16", "--instances", "8",
                "--pool_capacity", "4096", "--table_capacity", "8192",
                "--results_dir", "results", "--max_iters", "100", "--debug"])
    capsys.readouterr()
    with open(os.path.join(workdir, "results", "results.pkl"), "rb") as f:
        res = pickle.load(f)
    solved = [s for s in res["solutions"] if s is not None]
    assert len(solved) == 8  # 9-cell lights out, depth<=3: all solvable
    assert len(res["paths"][0]) == len(res["solutions"][0]) + 1

    # compare against itself: all-equal histogram
    compare.main(["--soln1", "results/results.pkl",
                  "--soln2", "results/results.pkl"])
    out = capsys.readouterr().out
    assert "% equal to soln1 length: 100.00%" in out

    # sorted-by-difficulty batching returns results in input order with the
    # same (optimal, weight-1) solution lengths
    solve.main(["--states", "testset/data_0.pkl", "--model",
                "saved_models/lo3/current", "--env", "lightsout3",
                "--weight", "1.0", "--batch_size", "16", "--instances", "4",
                "--sort_by_h", "--pool_capacity", "4096", "--table_capacity",
                "8192", "--results_dir", "results_sorted", "--max_iters",
                "100", "--debug"])
    capsys.readouterr()
    with open(os.path.join(workdir, "results_sorted", "results.pkl"),
              "rb") as f:
        res_s = pickle.load(f)
    assert [len(s) for s in res_s["solutions"]] == \
        [len(s) for s in res["solutions"]]
    np.testing.assert_array_equal(res_s["states"], res["states"])

    # gbfs eval CLI: data mode on the generated shard + fresh-scramble mode
    from deepcubea_tpu.cli import gbfs
    gbfs.main(["--model", "saved_models/lo3/current", "--env", "lightsout3",
               "--states", "testset", "--max_steps", "6"])
    out = capsys.readouterr().out
    assert "%solved" in out
    gbfs.main(["--model", "saved_models/lo3/current", "--env", "lightsout3",
               "--num_states", "12", "--back_max", "3"])
    out = capsys.readouterr().out
    assert "Back Steps" in out

    # alternate engines solve the same set (4 states to keep it quick)
    import shutil
    for engine in (["hybrid"] if shutil.which("g++") else []) + ["sharded"]:
        solve.main(["--states", "testset/data_0.pkl", "--model",
                    "saved_models/lo3/current", "--env", "lightsout3",
                    "--weight", "1.0", "--batch_size", "16",
                    "--end_idx", "4", "--engine", engine,
                    "--pool_capacity", "4096", "--table_capacity", "8192",
                    "--results_dir", f"results_{engine}", "--max_iters",
                    "100", "--debug"])
        capsys.readouterr()
        with open(os.path.join(workdir, f"results_{engine}",
                               "results.pkl"), "rb") as f:
            res_e = pickle.load(f)
        # all solved; validity is asserted inside the CLI itself
        assert all(s is not None for s in res_e["solutions"])


def test_solve_stream_cli(workdir, capsys):
    """--stream solves the same set through persistent slots with identical
    solution lengths and real per-state times."""
    from deepcubea_tpu.cli import solve

    solve.main(["--states", "testset/data_0.pkl", "--model",
                "saved_models/lo3/current", "--env", "lightsout3",
                "--weight", "1.0", "--batch_size", "16", "--instances", "3",
                "--stream", "--sort_by_h", "--pool_capacity", "4096",
                "--table_capacity", "8192", "--results_dir",
                "results_stream", "--max_iters", "100", "--debug"])
    out = capsys.readouterr().out
    assert "solved 8/8" in out
    with open(os.path.join(workdir, "results_stream", "results.pkl"),
              "rb") as f:
        res_t = pickle.load(f)
    with open(os.path.join(workdir, "results", "results.pkl"), "rb") as f:
        res = pickle.load(f)
    assert [len(s) for s in res_t["solutions"]] == \
        [len(s) for s in res["solutions"]]
    assert all(t > 0 for t in res_t["times"])


def test_solve_resume_cli(workdir, capsys):
    """--resume reloads results.pkl and solves only the missing states."""
    from deepcubea_tpu.cli import solve

    # fabricate an interrupted campaign: drop 3 solutions from a finished run
    with open(os.path.join(workdir, "results", "results.pkl"), "rb") as f:
        res = pickle.load(f)
    removed = [1, 4, 6]
    for i in removed:
        res["solutions"][i] = None
        res["paths"][i] = None
    os.makedirs("results_resume", exist_ok=True)
    with open(os.path.join(workdir, "results_resume", "results.pkl"),
              "wb") as f:
        pickle.dump(res, f)

    solve.main(["--states", "testset/data_0.pkl", "--model",
                "saved_models/lo3/current", "--env", "lightsout3",
                "--weight", "1.0", "--batch_size", "16", "--instances", "3",
                "--resume", "--stream", "--pool_capacity", "4096",
                "--table_capacity", "8192", "--results_dir",
                "results_resume", "--max_iters", "100", "--debug"])
    out = capsys.readouterr().out
    assert "resume: 5/8 already solved" in out
    # only the removed states were re-solved
    for i in removed:
        assert f"State: {i}," in out
    assert "State: 0," not in out
    with open(os.path.join(workdir, "results_resume", "results.pkl"),
              "rb") as f:
        res_r = pickle.load(f)
    with open(os.path.join(workdir, "results", "results.pkl"), "rb") as f:
        res_full = pickle.load(f)
    assert [len(s) for s in res_r["solutions"]] == \
        [len(s) for s in res_full["solutions"]]
