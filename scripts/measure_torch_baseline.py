"""One-off calibration: the reference's per-step hot-loop cost on this host.

Reconstructs the reference's per-env-step compute (SAC update: 3 backward
passes + Polyak at batch 256 on 256x2 MLPs; GAIL: discriminator BCE update
w/ grad penalty at batch 256 on a 64x1 MLP with spectral norm + reward
prediction) in torch CPU — the reference is torch-CPU — plus the measured
gymnasium hopper step cost, giving reference env-steps/s at the 1:1
step:update ratio."""
import time, numpy as np, torch, torch.nn as nn
torch.manual_seed(0)
S, A, B = 12, 3, 256

def mlp(i, h, d, o, sn=False):
    layers, prev = [], i
    for _ in range(d):
        lin = nn.Linear(prev, h)
        if sn: lin = nn.utils.parametrizations.spectral_norm(lin)
        layers += [lin, nn.ReLU()]
        prev = h
    lin = nn.Linear(prev, o)
    if sn: lin = nn.utils.parametrizations.spectral_norm(lin)
    layers.append(lin)
    return nn.Sequential(*layers)

actor = mlp(S, 256, 2, 2*A); critic1 = mlp(S+A, 256, 2, 1); critic2 = mlp(S+A, 256, 2, 1)
tc1 = mlp(S+A, 256, 2, 1); tc2 = mlp(S+A, 256, 2, 1)
log_alpha = torch.zeros(1, requires_grad=True)
disc = mlp(S+A, 64, 1, 1, sn=True)
opt_a = torch.optim.AdamW(actor.parameters(), 3e-4); opt_c = torch.optim.AdamW(list(critic1.parameters())+list(critic2.parameters()), 3e-4)
opt_t = torch.optim.Adam([log_alpha], 3e-4); opt_d = torch.optim.AdamW(disc.parameters(), 3e-5, weight_decay=10)

s = torch.randn(B, S); a = torch.tanh(torch.randn(B, A)); s2 = torch.randn(B, S); r = torch.randn(B)

def sac_step():
    with torch.no_grad():
        out = actor(s2); mean, logstd = out.chunk(2, 1)
        a2 = torch.tanh(mean + logstd.clamp(-20,2).exp()*torch.randn_like(mean))
        tv = torch.min(tc1(torch.cat([s2,a2],1)), tc2(torch.cat([s2,a2],1))).squeeze(1)
        tgt = r + 0.99*tv
    q1 = critic1(torch.cat([s,a],1)).squeeze(1); q2 = critic2(torch.cat([s,a],1)).squeeze(1)
    closs = ((q1-tgt)**2).mean() + ((q2-tgt)**2).mean()
    opt_c.zero_grad(set_to_none=True); closs.backward(); opt_c.step()
    out = actor(s); mean, logstd = out.chunk(2, 1)
    z = mean + logstd.clamp(-20,2).exp()*torch.randn_like(mean); na = torch.tanh(z)
    lp = (-0.5*z**2).sum(1)  # stand-in log prob, same op count class
    qv = torch.min(critic1(torch.cat([s,na],1)), critic2(torch.cat([s,na],1))).squeeze(1)
    aloss = (log_alpha.exp().detach()*lp - qv).mean()
    opt_a.zero_grad(set_to_none=True); aloss.backward(); opt_a.step()
    tloss = -(log_alpha.exp()*(lp.detach()+3)).mean()
    opt_t.zero_grad(set_to_none=True); tloss.backward(); opt_t.step()
    with torch.no_grad():
        for tp, p in zip(list(tc1.parameters())+list(tc2.parameters()), list(critic1.parameters())+list(critic2.parameters())):
            tp.mul_(0.995).add_(0.005*p)

def gail_step():
    de = disc(torch.cat([s,a],1)); dp = disc(torch.cat([s2,a],1))
    loss = nn.functional.binary_cross_entropy_with_logits(de, torch.ones_like(de)) + \
           nn.functional.binary_cross_entropy_with_logits(dp, torch.zeros_like(dp))
    eps = torch.rand(B,1); ms = (eps*s+(1-eps)*s2).requires_grad_(); ma = a.clone().requires_grad_()
    dm = disc(torch.cat([ms,ma],1))
    g = torch.autograd.grad(dm, (ms,ma), torch.ones_like(dm), create_graph=True)
    loss = loss + sum((gi.norm(2,dim=1)**2 for gi in g)).mean()
    opt_d.zero_grad(set_to_none=True); loss.backward(); opt_d.step()
    with torch.no_grad(): _ = disc(torch.cat([s,a],1))  # reward prediction

for _ in range(20): sac_step(); gail_step()
n = 200
t0 = time.time()
for _ in range(n): sac_step(); gail_step()
update_t = (time.time()-t0)/n

import gymnasium as gym
env = gym.make("Hopper-v4"); env.reset(seed=0)
act = np.zeros(3, np.float32)
for _ in range(100):
    _,_,term,trunc,_ = env.step(act)
    if term or trunc: env.reset()
t0 = time.time()
for _ in range(1000):
    _,_,term,trunc,_ = env.step(act)
    if term or trunc: env.reset()
env_t = (time.time()-t0)/1000
per_step = update_t + env_t
import json
print(json.dumps({"torch_update_s": update_t, "env_step_s": env_t,
                  "reference_env_steps_per_s": 1.0/per_step}))
