"""Translation-fusion parity against an independent PyTorch replica.

The composite chain test (test_composite_parity.py) pins the four module
outputs; these tests pin everything AFTER the modules — the global->local
pose assembly and the translation fusion semantics of the reference
`MobilePoserNet.forward_offline` (net.py:121-171) and `forward_online`
(net.py:174-219): contact-anchored foot velocity, `_prob_to_weight`
clamping, gravity velocity, floor-penetration clamp, and the cumulative
sum — so a bug shared by our online/offline/batched implementations (which
are tested only against each other) is caught here against torch.

The torch replica below is written from the reference's documented
behavior; the online path exercises the reference's raw-logit fusion
weight (no sigmoid), i.e. our `online_sigmoid=False` compat mode.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from mobileposer_tpu import config as C
from mobileposer_tpu.kinematics import ParametricModel
from mobileposer_tpu.kinematics.smpl import SMPL_PARENTS
from mobileposer_tpu.models import MODULE_CONFIGS, MobilePoserNet
from mobileposer_tpu.nn import convert_rnn_state_dict

from test_composite_parity import TorchRNN

VEL_SCALE = C.datasets.fps / C.amass.vel_scale          # 15
GRAVITY_Y = C.joint_set.gravity_velocity                # -0.018
REDUCED = list(C.joint_set.reduced)
IGNORED = list(C.joint_set.ignored)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(7)
    tmods = {name: TorchRNN(cfg).eval() for name, cfg in MODULE_CONFIGS.items()}
    params = {}
    for name, tm in tmods.items():
        sd = {f"m.{k}": v for k, v in tm.state_dict().items()}
        params[name] = convert_rnn_state_dict(sd, "m", MODULE_CONFIGS[name])
    body = ParametricModel.synthetic(num_vertices=240)
    net = MobilePoserNet(body, online_sigmoid=False)
    return tmods, params, net


# ---------------------------------------------------------------------------
# Torch replica of the reference fusion (independent implementation)
# ---------------------------------------------------------------------------

def _t_r6d_to_R(r6d):
    """Gram-Schmidt r6d -> rotmat (reference angular.py:167-182)."""
    r6d = r6d.reshape(-1, 6)
    c0 = torch.nn.functional.normalize(r6d[:, 0:3], dim=1)
    c1 = torch.nn.functional.normalize(
        r6d[:, 3:6] - (c0 * r6d[:, 3:6]).sum(dim=1, keepdim=True) * c0, dim=1)
    c2 = torch.linalg.cross(c0, c1, dim=1)
    return torch.stack((c0, c1, c2), dim=-1)


def _t_reduced_global_to_full(r6d):
    """reference net.py:93-99: reduced r6d -> full local rotations."""
    T = r6d.shape[0]
    rot = _t_r6d_to_R(r6d).reshape(T, len(REDUCED), 3, 3)
    glb = torch.eye(3).repeat(T, 24, 1, 1)
    glb[:, REDUCED] = rot
    local = glb.clone()
    for j in range(1, 24):
        local[:, j] = glb[:, int(SMPL_PARENTS[j])].transpose(-1, -2) @ glb[:, j]
    local[:, IGNORED] = torch.eye(3)
    local[:, 0] = glb[:, 0]
    return local


def _t_prob_to_weight(p):
    return (p.clamp(0.5, 0.9) - 0.5) / 0.4


def _t_modules(tmods, imu, vel_state=None):
    """Module chain wired like reference net.forward (net.py:101-119)."""
    with torch.no_grad():
        joints, _ = tmods["joints"](imu)
        x132 = torch.cat([joints, imu], dim=-1)
        r6d, _ = tmods["poser"](x132)
        contact, _ = tmods["footcontact"](x132)
        vel, vel_state = tmods["velocity"](x132, h=vel_state)
    return joints, r6d, vel, contact, vel_state


def _t_fuse_offline(joints, vel, contact, floor_y):
    """reference net.py:129-154. joints [T,24,3], vel [T,72], contact [T,2]."""
    T = joints.shape[0]
    grav = torch.tensor([0.0, GRAVITY_Y, 0.0])
    zero = torch.zeros(1, 3)
    lfoot = torch.cat((zero, joints[:-1, 10] - joints[1:, 10]))
    rfoot = torch.cat((zero, joints[:-1, 11] - joints[1:, 11]))
    idx = contact.max(dim=1).indices.view(-1, 1).float()
    contact_vel = grav + (lfoot + (rfoot - lfoot) * idx)

    pred_vel = vel.view(T, 24, 3)[:, 0] / VEL_SCALE
    weight = _t_prob_to_weight(contact.max(dim=1).values.sigmoid()).view(-1, 1)
    velocity = pred_vel + (contact_vel - pred_vel) * weight

    current_root_y = 0.0
    for i in range(T):
        current_foot_y = current_root_y + joints[i, 10:12, 1].min().item()
        if current_foot_y + velocity[i, 1].item() <= floor_y:
            velocity[i, 1] = floor_y - current_foot_y
        current_root_y += velocity[i, 1].item()
    return torch.cumsum(velocity, dim=0)


class _TOnline:
    """reference net.py:174-219 streaming state machine (raw-logit weight)."""

    def __init__(self, tmods, net):
        self.tmods = tmods
        self.imu = None
        self.vel_state = None
        self.last_lfoot = torch.tensor(np.asarray(net.feet_pos[0]))
        self.last_rfoot = torch.tensor(np.asarray(net.feet_pos[1]))
        self.current_root_y = 0.0
        self.last_root_pos = torch.zeros(3)
        self.floor_y = net.floor_y
        self.total = 45
        self.past = 40

    def step(self, frame):
        imu = (frame.repeat(self.total, 1) if self.imu is None
               else torch.cat((self.imu[1:], frame.view(1, -1))))
        joints_seq, r6d, vel, contact_seq, self.vel_state = _t_modules(
            self.tmods, imu.unsqueeze(0), self.vel_state)
        pose = _t_reduced_global_to_full(r6d.squeeze(0))[self.past]
        joints = joints_seq.squeeze(0)[self.past].view(24, 3)
        contact = contact_seq.squeeze(0)[self.past]
        lfoot, rfoot = joints[10], joints[11]
        grav = torch.tensor([0.0, GRAVITY_Y, 0.0])
        if contact[0] > contact[1]:
            contact_vel = self.last_lfoot - lfoot + grav
        else:
            contact_vel = self.last_rfoot - rfoot + grav
        pred_vel = vel.view(-1, 24, 3)[self.past, 0] / VEL_SCALE
        weight = _t_prob_to_weight(contact.max())           # raw logit!
        velocity = pred_vel + (contact_vel - pred_vel) * weight
        current_foot_y = self.current_root_y + min(lfoot[1].item(),
                                                   rfoot[1].item())
        if current_foot_y + velocity[1].item() <= self.floor_y:
            velocity[1] = self.floor_y - current_foot_y
        self.current_root_y += velocity[1].item()
        self.last_lfoot, self.last_rfoot = lfoot, rfoot
        self.imu = imu
        self.last_root_pos = self.last_root_pos + velocity
        return pose, joints, self.last_root_pos.clone(), contact


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_offline_fusion_parity(setup):
    tmods, params, net = setup
    T = 45
    torch.manual_seed(11)
    imu = torch.randn(1, T, 60) * 0.1

    t_joints, t_r6d, t_vel, t_contact, _ = _t_modules(tmods, imu)
    t_tran = _t_fuse_offline(t_joints.squeeze(0).view(T, 24, 3),
                             t_vel.squeeze(0), t_contact.squeeze(0),
                             net.floor_y)

    pose, joints, tran, contact = jax.jit(net.forward_offline)(
        params, jnp.asarray(imu.numpy()[0]))

    np.testing.assert_allclose(np.asarray(tran), t_tran.numpy(), atol=2e-5,
                               err_msg="offline translation fusion")
    np.testing.assert_allclose(np.asarray(contact), t_contact.numpy()[0],
                               atol=2e-5)


def test_offline_pose_assembly_parity(setup):
    """reduced r6d -> full local pose against the torch IK replica."""
    tmods, params, net = setup
    T = 20
    torch.manual_seed(12)
    imu = torch.randn(1, T, 60) * 0.1
    _, t_r6d, _, _, _ = _t_modules(tmods, imu)
    t_pose = _t_reduced_global_to_full(t_r6d.squeeze(0))

    pose, _, _, _ = jax.jit(net.forward_offline)(
        params, jnp.asarray(imu.numpy()[0]))
    np.testing.assert_allclose(np.asarray(pose), t_pose.numpy(), atol=3e-5,
                               err_msg="full local pose assembly")


def test_online_fusion_parity(setup):
    """Per-frame streaming incl. window init, carried feet anchors, floor
    clamp, and the reference's raw-logit fusion weight."""
    tmods, params, net = setup
    torch.manual_seed(13)
    n_frames = 6
    frames = torch.randn(n_frames, 60) * 0.1

    t_online = _TOnline(tmods, net)
    state = net.init_online_state()
    step = jax.jit(net.forward_online)

    for i in range(n_frames):
        t_pose, t_joints, t_root, t_contact = t_online.step(frames[i])
        (pose, joints, root, contact), state = step(
            params, state, jnp.asarray(frames[i].numpy()))
        np.testing.assert_allclose(np.asarray(root), t_root.numpy(),
                                   atol=3e-5, err_msg=f"root pos, frame {i}")
        np.testing.assert_allclose(np.asarray(pose), t_pose.numpy(),
                                   atol=3e-5, err_msg=f"pose, frame {i}")
        np.testing.assert_allclose(np.asarray(joints).reshape(24, 3),
                                   t_joints.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(contact), t_contact.numpy(),
                                   atol=2e-5)
