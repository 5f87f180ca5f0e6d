"""Regenerate parity goldens from the live reference checkout.

Reference-replay tooling (SURVEY.md §7 step 9): when /root/reference is
mounted, re-measures every golden pinned in BASELINE.md / tests and prints
them for comparison. Run: ``python tools/regen_goldens.py``.
"""

import sys

sys.path.insert(0, "/root/reference")
sys.path.insert(0, ".")

import numpy as np


def main():
    import newsvendor as ref_nv
    import inventory_management as ref_im
    import network_management as ref_net
    import network_management_custom as ref_netc

    env = ref_nv.NewsvendorEnv()
    obs, _ = env.reset(seed=42)
    print("newsvendor reset obs:", np.round(obs, 4).tolist())
    total, demands = 0.0, []
    for _ in range(40):
        obs, r, te, tr, info = env.step(np.array([100.0], np.float32))
        total += r
        demands.append(info["demand"])
    print("newsvendor first 5 demands:", demands[:5])
    print("newsvendor order=100 total reward:", round(total, 4))

    for cls, label in [(ref_im.InvManagementBacklogEnv, "backlog"),
                       (ref_im.InvManagementLostSalesEnv, "lost_sales")]:
        env = cls()
        env.reset(seed=42)
        total, demands = 0.0, []
        for _ in range(30):
            obs, r, te, tr, info = env.step(np.array([20, 20, 20], np.int64))
            total += r
            demands.append(info["demand_realized"])
        print(f"inv_mgmt {label} first 5 demands: {demands[:5]}; "
              f"total: {round(total, 4)}")

    env = ref_net.NetInvMgmtBacklogEnv(num_periods=30)
    env.reset(seed=42)
    total = sum(env.step(np.full(11, 20.0, np.float32))[1] for _ in range(30))
    print("net default backlog total:", round(total, 2))

    env = ref_netc.NetInvMgmtLostSalesEnv(num_periods=40)
    env.reset(seed=42)
    total = sum(env.step(np.full(5, 20.0, np.float32))[1] for _ in range(40))
    print("net custom 'lost-sales' (de facto backlog) total:", round(total, 2))


if __name__ == "__main__":
    main()
