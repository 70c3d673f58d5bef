"""Encrypted ERC20: the reference's canonical fhevm workload.

Reproduces the EncryptedERC20 contract semantics
(reference: tests/fhevm-suite/e2e/test/encryptedERC20/ and the
benchmark flow of e2e_old/test/benchmarks/erc20.ts:20-76 --
mint / create transfer input / transfer with balance check / decrypt):

    transfer(from, to, amount):
        canPay   = amount <= balance[from]          (FHE.le)
        moved    = canPay ? amount : 0              (FHE.select)
        balance[from] -= moved
        balance[to]   += moved

Every step runs through the coprocessor op loop (FhevmInstance.fhe_op),
i.e. batched radix PBS on the device. Run:  python examples/encrypted_erc20.py
"""

import sys
import time

sys.path.insert(0, ".")

from tfhe_tpu import params as tp
from tfhe_tpu.api.instance import create_instance


class EncryptedERC20:
    """Handle-level port of EncryptedERC20.sol over the instance API."""

    def __init__(self, inst, owner: str):
        self.inst = inst
        self.owner = owner
        self.balances: dict[str, bytes] = {}
        self.total_supply = 0

    def _encrypt_amount(self, user: str, amount: int) -> bytes:
        inp = self.inst.create_encrypted_input("0x" + "ec" * 20, user)
        inp.add64(amount)
        return inp.encrypt()["handles"][0]

    def mint(self, amount: int):
        h = self._encrypt_amount(self.owner, amount)
        if self.owner in self.balances:
            self.balances[self.owner] = self.inst.fhe_op(
                "add", self.balances[self.owner], h
            )
        else:
            self.balances[self.owner] = h
        self.total_supply += amount

    def transfer(self, frm: str, to: str, enc_amount: bytes):
        inst = self.inst
        bal_from = self.balances[frm]
        if to not in self.balances:
            self.balances[to] = self._encrypt_amount(to, 0)
        can_pay = inst.fhe_op("le", enc_amount, bal_from)
        zero = self._encrypt_amount(frm, 0)
        moved = inst.fhe_op("select", can_pay, enc_amount, zero)
        self.balances[frm] = inst.fhe_op("sub", bal_from, moved)
        self.balances[to] = inst.fhe_op("add", self.balances[to], moved)

    def balance_of(self, who: str) -> int:
        h = self.balances[who]
        self.inst.acl.allow_for_decryption(h)
        return int(self.inst.public_decrypt([h])["0x" + h.hex()])


def main():
    params = tp.TOY_SHORTINT if "--toy" in sys.argv else tp.PARAM_MESSAGE_2_CARRY_2_KS_PBS_TUNIFORM_2M128
    print(f"params: {params.name}")
    t0 = time.time()
    inst = create_instance(params, seed=7)
    print(f"keygen: {time.time()-t0:.1f}s")
    alice, bob = "0x" + "a1" * 20, "0x" + "b0" * 20

    token = EncryptedERC20(inst, alice)
    timings = {}

    t = time.time()
    token.mint(10_000)
    timings["mint"] = time.time() - t

    t = time.time()
    enc_amt = token._encrypt_amount(alice, 1_337)
    timings["create transfer input"] = time.time() - t

    t = time.time()
    token.transfer(alice, bob, enc_amt)
    timings["transfer"] = time.time() - t

    t = time.time()
    ba, bb = token.balance_of(alice), token.balance_of(bob)
    timings["decrypt x2"] = time.time() - t

    assert ba == 10_000 - 1_337 and bb == 1_337, (ba, bb)

    # over-draw: transfer must silently no-op (canPay == false)
    big = token._encrypt_amount(bob, 50_000)
    token.transfer(bob, alice, big)
    assert token.balance_of(bob) == 1_337

    print("balances after transfer:", ba, bb, "(overdraw no-op ok)")
    for k, v in timings.items():
        print(f"  {k:24s}: {v*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
