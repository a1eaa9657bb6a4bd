"""Session + config layer tests (the reference's ParameterLoader coverage,
cf. ``tests/test_simulation.py`` + ``test_simulation_manager.py``)."""

import numpy as np
import pytest
import jax.numpy as jnp

from vgpmp_tpu.config import load_parameters_yaml
from vgpmp_tpu.session import PlanningSession, base_pose_matrix, quat_to_rotmat

REF_YAML = "/root/reference/parameters.yaml"


def test_quat_to_rotmat_identity_and_z180():
    np.testing.assert_allclose(quat_to_rotmat([0, 0, 0, 1]), np.eye(3), atol=1e-12)
    Rz = quat_to_rotmat([0, 0, -1, 0])  # 180 deg about z (ur10 bookshelves orn)
    np.testing.assert_allclose(Rz, np.diag([-1.0, -1.0, 1.0]), atol=1e-12)


@pytest.mark.parametrize(
    "robot,ps", [("franka", "industrial"), ("wam", "lab"), ("ur10", "bookshelves")]
)
def test_session_builds(robot, ps):
    s = PlanningSession(robot, ps, dtype=jnp.float64)
    n = len(s.states)
    assert s.num_queries == n * (n - 1) // 2
    starts, goals = s.queries()
    assert starts.shape == (s.num_queries, s.spec.dof)
    assert s.model.num_inducing == s.planner_params["num_inducing"]
    # WAM base sits on its 0.346 m pedestal (benchmarking.py:52-65 convention)
    if robot == "wam":
        assert abs(s.base_pose[2, 3] - (1.3752 if ps == "lab" else 0.346)) < 1e-9


def test_reference_yaml_parses():
    cfg = load_parameters_yaml(REF_YAML)
    assert cfg.robot_name == "wam"
    assert cfg.benchmark is True
    assert cfg.problemset_name == "bookshelves"
    mask = cfg.trainable_mask()
    assert mask["q_mu"] and mask["q_sqrt"] and not mask["alpha_u"]


def test_session_from_reference_yaml():
    s = PlanningSession.from_config(REF_YAML, dtype=jnp.float64)
    assert s.robot_name == "wam"
    assert s.problemset_name == "bookshelves"
    assert s.trainable is not None and s.trainable["z_u"] is False


def test_overrides_win():
    s = PlanningSession(
        "franka", "industrial", dtype=jnp.float64, overrides=dict(num_inducing=5)
    )
    assert s.model.num_inducing == 5


def test_non_benchmark_mode(tmp_path):
    yaml_text = """
- robot:
    robot_name: "franka"
- scene:
    position: [0.1, 0.2, 0.3]
    orientation: [0.0, 0.0, 0.0, 1.0]
    environment_name: "industrial"
    environment_file_name: "industrial"
    sdf_file_name: "industrial"
    objects: []
    benchmark: False
    non_benchmark_attributes:
      states: [
        [0.0, 0.3, 0.0, -1.2, 0.0, 1.5, 0.0],
        [0.5, 0.3, 0.2, -1.0, 0.0, 1.5, 0.5]
      ]
      robot_pos_and_orn: [[0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
      planner_params:
        sigma_obs: 0.005
        epsilon: 0.05
        lengthscales: [2.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0]
        variance: 0.2
        alpha: 100
        num_samples: 4
        num_inducing: 6
        learning_rate: 0.05
        num_steps: 10
        time_spacing_X: 12
        time_spacing_Xnew: 16
    benchmark_attributes:
- trainable_params:
    q_mu: True
    q_sqrt: True
    lengthscales: False
    kernel_variance: False
    sigma_obs: False
    inducing_variable: False
    alpha: False
- graphics:
    visuals: False
"""
    p = tmp_path / "params.yaml"
    p.write_text(yaml_text)
    s = PlanningSession.from_config(p, dtype=jnp.float64)
    assert s.num_queries == 1
    assert s.model.num_inducing == 6
    np.testing.assert_allclose(s.scene_offset, [0.1, 0.2, 0.3])
    assert s.trainable["lengthscales_u"] is False


@pytest.mark.parametrize("robot", ["franka", "kuka", "wam", "ur10"])
def test_testing_problemset_loads(robot):
    """The reference's degenerate 'testing' problemsets (all-zero states and
    params, data/problemsets/*.py 'testing' branches) load as data without
    building a model/scene."""
    s = PlanningSession(robot, "testing", dtype=jnp.float64)
    assert s.model is None and s.scene is None
    assert len(s.states) == 2
    assert s.states.shape[1] == s.spec.dof
    assert s.planner_params["num_steps"] == 0
    assert s.base_pose.shape == (4, 4)
