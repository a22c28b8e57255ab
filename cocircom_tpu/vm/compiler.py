"""circom frontend: elaboration to a leveled witness-extension op tape.

TPU-first design (NOT the reference's stack bytecode): since valid circom
control flow is compile-time (vars/params only), the whole circuit is
elaborated eagerly into an SSA op tape over symbolic signals; the tape is
topologically sorted into LEVELS — the natural unit for batching secret-
shared ops into single communication rounds (the role of the reference's
circom-mpc-vm, SURVEY.md L4, re-designed for vectorized execution).

Signal/witness layout parity with circom (validated against the committed
KAT witnesses in /root/reference/test_vectors/WitnessExtension/kats):
  [1 | main outputs | main inputs | main intermediates | subcomponent
   signals depth-first in instantiation order]; a signal assigned from
  exactly another signal is wire-aliased (no witness slot) unless both
  are main signals.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from ..fields.params import CurveParams
from .parser import parse_circom


class Sig:
    __slots__ = ("uid",)
    _next = [0]

    def __init__(self):
        self.uid = Sig._next[0]
        Sig._next[0] += 1

    def __repr__(self):
        return f"Sig({self.uid})"


class Temp:
    __slots__ = ("tid",)

    def __init__(self, tid):
        self.tid = tid

    def __repr__(self):
        return f"Temp({self.tid})"


@dataclass
class Component:
    template: str
    outs: list = field(default_factory=list)  # [(name, [Sig...], dims)]
    ins: list = field(default_factory=list)
    inters: list = field(default_factory=list)
    subs: list = field(default_factory=list)  # [Component] instantiation order
    sig_by_name: dict = field(default_factory=dict)  # name -> (kind, flat list, dims)


@dataclass
class CompiledCircuit:
    curve: CurveParams
    n_signals: int  # witness slots excluding the leading 1
    n_outputs: int
    input_slots: dict  # name -> list of slot indices (1-based wtns index)
    output_slots: dict
    public_names: list
    levels: list  # list of [ (op, dst, operands) ]; operand = ('c',v)|('w',slot)|('t',tid)
    n_temps: int

    @property
    def n_vars(self):
        return self.n_signals + 1


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class Elaborator:
    def __init__(self, templates, functions, p: int):
        self.templates = templates
        self.functions = functions
        self.p = p
        self.ops = []  # (op, dst(Sig|Temp), [operands: int|Sig|Temp])
        self.n_temps = 0
        self.temp_deg: list[int] = []  # polynomial degree per temp (2 = nonlin)
        self.binding = {}  # uid -> value (Sig|Temp|int): aliased/eliminated
        self._created = []  # every Component in instantiation order
        self.root_comp = None  # the main component (its signals keep slots)
        self.sig_owner = {}  # uid -> Component
        # secret-condition branching state (parity: circom-mpc-vm
        # mpc_vm.rs:104-176 IfCtxStack + :649-754 shared function returns)
        self.cond_stack = []  # [(outer_acc|None, acc, cond)]
        self.fn_stack = []  # [{"rets": [(cond, val)], "entry": depth}]
        self.sig_val = {}  # uid -> last assigned value expr (for cmux merge)

    # ------------------------------------------------------- value helpers

    def resolve(self, v):
        """Follow signal bindings to the defining value."""
        while isinstance(v, Sig) and v.uid in self.binding:
            v = self.binding[v.uid]
        return v

    def _deg(self, v) -> int:
        if isinstance(v, int):
            return 0
        if isinstance(v, Sig):
            return 1
        return self.temp_deg[v.tid]

    def new_temp(self, deg: int = 2) -> Temp:
        t = Temp(self.n_temps)
        self.n_temps += 1
        self.temp_deg.append(deg)
        return t

    LINEAR_OPS = {"add", "sub", "neg", "sett", "setc"}

    def emit(self, op, operands) -> Temp:
        operands = [self.resolve(o) for o in operands]
        if op in ("add", "sub"):
            deg = max(self._deg(o) for o in operands)
        elif op == "neg":
            deg = self._deg(operands[0])
        elif op == "mul":
            deg = min(2, sum(self._deg(o) for o in operands))
        elif op == "div":
            deg = self._deg(operands[0]) if self._deg(operands[1]) == 0 else 2
        else:
            deg = 2
        dst = self.new_temp(deg)
        self.ops.append((op, dst, operands))
        return dst

    def _val(self, x: int) -> int:
        x %= self.p
        return x - self.p if x > self.p // 2 else x

    def const_op2(self, op, a: int, b: int) -> int:
        """circom semantics on compile-time field elements (plain.rs parity)."""
        p = self.p
        a %= p
        b %= p
        if op == "+":
            return (a + b) % p
        if op == "-":
            return (a - b) % p
        if op == "*":
            return (a * b) % p
        if op == "/":
            return a * pow(b, -1, p) % p
        if op == "\\":
            return a // b
        if op == "%":
            return a % b
        if op == "**":
            return pow(a, b, p)
        if op == "<":
            return int(self._val(a) < self._val(b))
        if op == ">":
            return int(self._val(a) > self._val(b))
        if op == "<=":
            return int(self._val(a) <= self._val(b))
        if op == ">=":
            return int(self._val(a) >= self._val(b))
        if op == "==":
            return int(a == b)
        if op == "!=":
            return int(a != b)
        if op == "&&":
            return int(bool(a) and bool(b))
        if op == "||":
            return int(bool(a) or bool(b))
        if op == "&":
            return a & b
        if op == "|":
            return a | b
        if op == "^":
            return a ^ b
        if op == "<<":
            return (a << b) % p if b < 256 else 0
        if op == ">>":
            return a >> b if b < 256 else 0
        raise ValueError(f"unknown op {op}")

    BIN_OPNAME = {
        "+": "add", "-": "sub", "*": "mul", "/": "div", "\\": "idiv",
        "%": "mod", "**": "pow", "<": "lt", ">": "gt", "<=": "le",
        ">=": "ge", "==": "eq", "!=": "neq", "&&": "land", "||": "lor",
        "&": "band", "|": "bor", "^": "bxor", "<<": "shl", ">>": "shr",
    }

    def binop(self, op, a, b):
        if isinstance(a, int) and isinstance(b, int):
            return self.const_op2(op, a, b)
        if op in ("/", "\\", "%") and self._secret():
            # guarded division under a secret/runtime condition: the untaken
            # branch still executes, so its denominator is replaced by 1
            # (parity: mpc_vm.rs:523-531 Div cmux guard)
            if isinstance(b, int):
                if b % self.p == 0:
                    b = 1
            else:
                b = self.emit("cmux", [self._acc_cond(), b, 1])
        return self.emit(self.BIN_OPNAME[op], [a, b])

    # ---- secret-condition contexts (mpc_vm.rs IfCtxStack parity) ----

    def _secret(self) -> bool:
        return bool(self.cond_stack)

    def _acc_cond(self):
        return self.cond_stack[-1][1]

    def _not(self, c):
        return self.binop("-", 1, c)

    def _push_cond(self, cond):
        outer = self.cond_stack[-1][1] if self.cond_stack else None
        acc = cond if outer is None else self.emit("mul", [outer, cond])
        self.cond_stack.append((outer, acc, cond))

    def _toggle_cond(self):
        outer, _, cond = self.cond_stack[-1]
        notc = self._not(cond)
        acc = notc if outer is None else self.emit("mul", [outer, notc])
        self.cond_stack[-1] = (outer, acc, cond)

    def _pop_cond(self):
        self.cond_stack.pop()

    def _merge_val(self, cond, new, old):
        """cmux(cond, new, old); recursive over arrays, zero-padded to the
        longer length (mpc_vm.rs:690-692 resize semantics)."""
        if isinstance(new, list) or isinstance(old, list):
            if not isinstance(new, list):
                new = [new]
            if not isinstance(old, list):
                old = [old]
            n = max(len(new), len(old))
            new = new + [0] * (n - len(new))
            old = old + [0] * (n - len(old))
            return [self._merge_val(cond, x, y) for x, y in zip(new, old)]
        new = self.resolve(new)
        old = self.resolve(old)
        if isinstance(new, int) and isinstance(old, int) and new % self.p == old % self.p:
            return new % self.p
        return self.emit("cmux", [cond, new, old])

    def _finish_fn(self, ctx, final_val):
        """Merge accumulated conditional returns: sum of cond_i * val_i,
        with the fall-through/unconditional value weighted by the product of
        negated prior conditions (mpc_vm.rs:784-808)."""
        rets = list(ctx["rets"])
        if not rets:
            return final_val
        conds = [c for c, _ in rets]
        vals = [v for _, v in rets]
        if final_val is not None:
            fc = None
            for c in conds:
                nc = self._not(c)
                fc = nc if fc is None else self.emit("mul", [fc, nc])
            conds.append(fc)
            vals.append(final_val)
        width = max((len(v) if isinstance(v, list) else 1) for v in vals)
        is_list = any(isinstance(v, list) for v in vals)

        def elem(v, i):
            if isinstance(v, list):
                return v[i] if i < len(v) else 0
            return v if i == 0 else 0

        out = []
        for i in range(width):
            acc = None
            for c, v in zip(conds, vals):
                term = self.binop("*", c, elem(v, i))
                acc = term if acc is None else self.binop("+", acc, term)
            out.append(acc)
        return out if is_list else out[0]

    def unop(self, op, a):
        if isinstance(a, int):
            if op == "-":
                return (-a) % self.p
            if op == "!":
                return int(not a)
            if op == "~":
                return (~a) % self.p
        name = {"-": "neg", "!": "lnot", "~": "bnot"}[op]
        return self.emit(name, [a])

    # ------------------------------------------------------- elaboration

    def instantiate(self, tmpl_name: str, args: list) -> Component:
        params, body = self.templates[tmpl_name]
        if len(args) != len(params):
            raise ValueError(f"{tmpl_name} expects {len(params)} params")
        comp = Component(template=tmpl_name)
        if self.root_comp is None:
            self.root_comp = comp
        self._created.append(comp)
        env = {pn: av for pn, av in zip(params, args)}
        env["__comp__"] = comp
        self.exec_stmt(body, env, comp)
        return comp

    def call_function(self, name: str, args: list):
        # accelerator intrinsics (parity: accelerator.rs:17-68): circomlib's
        # Tonelli-Shanks `sqrt` has data-dependent loops, so a symbolic
        # argument routes to the sqrt op (host: Tonelli-Shanks; MPC: masked
        # open, rep3.rs:400)
        if name == "sqrt" and len(args) == 1 and not isinstance(args[0], int):
            return self.emit("sqrt", [args[0]])
        params, body = self.functions[name]
        env = {pn: av for pn, av in zip(params, args)}
        ctx = {"rets": [], "entry": len(self.cond_stack)}
        self.fn_stack.append(ctx)
        try:
            self.exec_stmt(body, env, None)
        except _Return as r:
            return self._finish_fn(ctx, r.value)
        finally:
            self.fn_stack.pop()
        if ctx["rets"]:
            return self._finish_fn(ctx, None)
        raise ValueError(f"function {name} did not return")

    # ---- lvalue resolution: returns (container, index) or signal handle ----

    def _flat_dims(self, dims, env, comp):
        out = []
        for dexpr in dims:
            v = self.eval(dexpr, env, comp)
            if not isinstance(v, int):
                raise ValueError("array dims must be compile-time")
            out.append(v)
        return out

    @staticmethod
    def _make_array(dims, make):
        if not dims:
            return make()
        return [Elaborator._make_array(dims[1:], make) for _ in range(dims[0])]

    @staticmethod
    def _flatten(x):
        if isinstance(x, list):
            out = []
            for e in x:
                out.extend(Elaborator._flatten(e))
            return out
        return [x]

    def exec_stmt(self, st, env, comp):
        tag = st[0]
        if tag == "block":
            for s in st[1]:
                self.exec_stmt(s, env, comp)
        elif tag == "decl_signal":
            _, kind, name, dims_e, init = st
            dims = self._flat_dims(dims_e, env, comp)
            arr = self._make_array(dims, Sig)
            flat = self._flatten(arr)
            bucket = {"output": comp.outs, "input": comp.ins, "intermediate": comp.inters}[kind]
            bucket.append((name, flat, dims))
            comp.sig_by_name[name] = (kind, arr)
            for s in flat:
                self.sig_owner[s.uid] = comp
            env[name] = arr
            if init is not None:
                _op, expr = init
                self.assign_signal(
                    arr, self.eval(expr, env, comp), comp, constrained=_op == "<=="
                )
        elif tag == "decl_var":
            _, name, dims_e, init = st
            dims = self._flat_dims(dims_e, env, comp)
            if dims:
                env[name] = self._make_array(dims, lambda: 0)
            else:
                env[name] = 0
            if init is not None:
                env[name] = self.eval(init, env, comp)
        elif tag == "decl_comp":
            _, name, dims_e = st
            dims = self._flat_dims(dims_e, env, comp)
            env[name] = self._make_array(dims, lambda: None) if dims else None
        elif tag == "assign":
            _, op, lhs, rhs = st
            val = self.eval(rhs, env, comp)
            if op not in ("=", "<==", "<--") and op.endswith("="):
                cur = self.eval(lhs, env, comp)
                val = self.binop(op[:-1], cur, val)
                op = "="
            self.assign(lhs, op, val, env, comp)
        elif tag == "constraint":
            pass  # === adds a constraint, no witness effect
        elif tag == "for":
            _, init, cond, step, body = st
            scope = dict(env)
            self.exec_stmt(init, scope, comp)
            while True:
                c = self.eval(cond, scope, comp)
                if not isinstance(c, int):
                    raise ValueError("loop condition must be compile-time")
                if not c:
                    break
                self.exec_stmt(body, scope, comp)
                self.exec_stmt(step, scope, comp)
            for k in env:
                if k in scope:
                    env[k] = scope[k]
        elif tag == "while":
            _, cond, body = st
            while True:
                c = self.eval(cond, env, comp)
                if not isinstance(c, int):
                    raise ValueError("loop condition must be compile-time")
                if not c:
                    break
                self.exec_stmt(body, env, comp)
        elif tag == "if":
            _, cond, then, els = st
            c = self.eval(cond, env, comp)
            if isinstance(c, int):
                if c:
                    self.exec_stmt(then, env, comp)
                elif els is not None:
                    self.exec_stmt(els, env, comp)
            else:
                # runtime/secret condition: execute BOTH branches; stores and
                # returns inside merge via cmux (mpc_vm.rs:471-506)
                self._push_cond(self.resolve(c))
                self.exec_stmt(then, env, comp)
                if els is not None:
                    self._toggle_cond()
                    self.exec_stmt(els, env, comp)
                self._pop_cond()
        elif tag == "return":
            val = self.eval(st[1], env, comp)
            if self.fn_stack and len(self.cond_stack) > self.fn_stack[-1]["entry"]:
                # conditional return: record (condition, value) and continue
                # executing — merged at function exit (mpc_vm.rs:649-713)
                ctx = self.fn_stack[-1]
                this = self._acc_cond()
                for pc, _ in ctx["rets"]:
                    this = self.binop("*", this, self._not(pc))
                ctx["rets"].append((this, val))
            else:
                raise _Return(val)
        elif tag == "assert":
            v = self.eval(st[1], env, comp)
            if not self._secret() and isinstance(v, int) and not v:
                raise AssertionError("circom assert failed at compile time")
        elif tag == "log":
            pass
        elif tag == "expr":
            self.eval(st[1], env, comp)
        else:
            raise ValueError(f"unhandled stmt {tag}")

    def assign(self, lhs, op, val, env, comp):
        # resolve lhs to var slot / signal / component field
        target = self._resolve_lvalue(lhs, env, comp)
        kind = target[0]
        if kind == "var":
            container, key = target[1], target[2]
            if self._secret():
                # store under a secret condition -> cmux with the old value
                # (mpc_vm.rs:312-352 store handling)
                container[key] = self._merge_val(self._acc_cond(), val, container[key])
            else:
                container[key] = val
        elif kind == "signal":
            self.assign_signal(target[1], val, comp, constrained=op != "<--")
        elif kind == "comp_slot":
            container, key = target[1], target[2]
            if op != "=":
                raise ValueError("components are assigned with =")
            container[key] = val
        else:
            raise ValueError(kind)

    def _resolve_lvalue(self, lhs, env, comp):
        tag = lhs[0]
        if tag == "var":
            name = lhs[1]
            if comp is not None and name in comp.sig_by_name:
                return ("signal", env[name])
            if name in env:
                cur = env[name]
                if isinstance(cur, Component) or cur is None:
                    return ("comp_slot", env, name)
                return ("var", env, name)
            env[name] = 0
            return ("var", env, name)
        if tag == "idx":
            base = self._resolve_lvalue(lhs[1], env, comp)
            idx = self.eval(lhs[2], env, comp)
            if not isinstance(idx, int):
                raise ValueError("index must be compile-time")
            if base[0] in ("var", "comp_slot"):
                container = base[1][base[2]]
                if isinstance(container, list):
                    if container and (container[0] is None or isinstance(container[0], (Component, list))):
                        # could be component array or nested arr
                        pass
                    return (
                        "comp_slot" if self._is_comp_arr(container) else "var",
                        container,
                        idx,
                    )
                raise ValueError("indexing non-array")
            if base[0] == "signal":
                return ("signal", base[1][idx])
            raise ValueError("bad index target")
        if tag == "mem":
            inst = self.eval(lhs[1], env, comp)
            if not isinstance(inst, Component):
                raise ValueError("member access on non-component")
            fname = lhs[2]
            kind, arr = inst.sig_by_name[fname]
            return ("signal", arr)
        raise ValueError(f"bad lvalue {tag}")

    @staticmethod
    def _is_comp_arr(container):
        probe = container
        while isinstance(probe, list) and probe:
            probe = probe[0]
        return probe is None or isinstance(probe, Component)

    def assign_signal(self, sig_or_arr, val, comp, constrained: bool = True):
        if isinstance(sig_or_arr, list):
            if not isinstance(val, list):
                raise ValueError("array signal assignment shape mismatch")
            if len(val) != len(sig_or_arr):
                # merged function returns may be longer (zero-padded union of
                # branch shapes): truncate/pad to the declared signal shape,
                # matching the reference's izip over the declared return size
                # (mpc_vm.rs:789-800)
                val = val[: len(sig_or_arr)] + [0] * (len(sig_or_arr) - len(val))
            for s, v in zip(sig_or_arr, val):
                self.assign_signal(s, v, comp, constrained)
            return
        sig = sig_or_arr
        val = self.resolve(val)
        if self._secret():
            val = self._merge_val(self._acc_cond(), val, self.sig_val.get(sig.uid, 0))
        self.sig_val[sig.uid] = val
        is_main = self.sig_owner.get(sig.uid) is self.root_comp
        # circom O2 linear substitution: a non-main signal CONSTRAINED (<==)
        # to a linear (deg<=1) value is eliminated — it becomes a binding.
        if constrained and not is_main and self._deg(val) <= 1:
            self.binding[sig.uid] = val
            return
        if (
            constrained
            and is_main
            and isinstance(val, Sig)
            and self.sig_owner.get(val.uid) is not self.root_comp
        ):
            # main <== subcomponent signal: the NON-main wire is eliminated
            # (its producer writes straight into the main slot)
            self.binding[val.uid] = sig
            return
        if isinstance(val, int):
            self.ops.append(("setc", sig, [val % self.p]))
        else:
            self.ops.append(("sett", sig, [val]))

    def eval(self, e, env, comp):
        tag = e[0]
        if tag == "num":
            v = e[1]
            return (int(v, 16) if v.startswith(("0x", "0X")) else int(v)) % self.p
        if tag == "arr":
            return [self.eval(x, env, comp) for x in e[1]]
        if tag == "str":
            return e[1]
        if tag == "var":
            name = e[1]
            if name in env:
                v = env[name]
                return v
            raise NameError(f"unknown identifier {name}")
        if tag == "idx":
            base = self.eval(e[1], env, comp)
            idx = self.eval(e[2], env, comp)
            if not isinstance(idx, int):
                raise ValueError("index must be compile-time")
            return base[idx]
        if tag == "mem":
            inst = self.eval(e[1], env, comp)
            if not isinstance(inst, Component):
                raise ValueError("member access on non-component")
            _kind, arr = inst.sig_by_name[e[2]]
            return arr
        if tag == "bin":
            _, op, l, r = e
            a = self.eval(l, env, comp)
            b = self.eval(r, env, comp)
            a = self._sigval(a)
            b = self._sigval(b)
            return self.binop(op, a, b)
        if tag == "un":
            return self.unop(e[1], self._sigval(self.eval(e[2], env, comp)))
        if tag == "tern":
            c = self.eval(e[1], env, comp)
            if isinstance(c, int):
                return self.eval(e[2] if c else e[3], env, comp)
            a = self.eval(e[2], env, comp)
            b = self.eval(e[3], env, comp)
            return self._merge_val(self.resolve(c), a, b)
        if tag == "call":
            name = e[1]
            args = [self.eval(a, env, comp) for a in e[2]]
            if name in self.templates:
                return self.instantiate(name, args)
            if name in self.functions:
                return self.call_function(name, args)
            raise NameError(f"unknown callable {name}")
        raise ValueError(f"unhandled expr {tag}")

    @staticmethod
    def _sigval(v):
        return v


def compile_circom(
    src: str, curve: CurveParams, link: list[str] | None = None
) -> CompiledCircuit:
    link = link or []
    templates: dict = {}
    functions: dict = {}
    main = None
    seen = set()

    def load(text: str, base: str):
        nonlocal main
        includes, tpls, funcs, m = parse_circom(text)
        for inc in includes:
            path = None
            for d in [base] + link:
                cand = os.path.join(d, inc)
                if os.path.isfile(cand):
                    path = cand
                    break
            if path is None:
                raise FileNotFoundError(f"include {inc!r} not found")
            if path not in seen:
                seen.add(path)
                load(open(path).read(), os.path.dirname(path))
        templates.update(tpls)
        functions.update(funcs)
        if m is not None:
            main = m

    load(src, ".")
    if main is None:
        raise ValueError("no main component")
    (main_expr, publics) = main
    if main_expr[0] != "call":
        raise ValueError("main must instantiate a template")

    el = Elaborator(templates, functions, curve.fr.p)
    args = [el.eval(a, {}, None) for a in main_expr[2]]
    root = el.instantiate(main_expr[1], args)

    # ---- final id assignment: root first, then every component in global
    # instantiation order; within a component outputs/inputs/intermediates.
    # Root inputs are ordered PUBLIC-FIRST: circom places public input
    # signals directly after the outputs in the witness, so that the public
    # part of the witness is the prefix [1, outputs, public inputs]
    # (the layout SharedWitness/post_processing depends on,
    # circom-mpc-vm/src/mpc_vm.rs:812-824). ----
    order: list[Sig] = []

    def visit_all(c: Component):
        ins = c.ins
        if c is root and publics:
            pub = [b for b in ins if b[0] in publics]
            priv = [b for b in ins if b[0] not in publics]
            ins = pub + priv
        for bucket in (c.outs, ins, c.inters):
            for _name, flat, _dims in bucket:
                order.extend(flat)

    for c in el._created:
        visit_all(c)

    # slots: signals without a binding, in dfs order
    slot_of: dict[int, int] = {}
    next_slot = 1
    for s in order:
        if s.uid not in el.binding and s.uid not in slot_of:
            slot_of[s.uid] = next_slot
            next_slot += 1
    n_signals = next_slot - 1

    def conv_value(x):
        x = el.resolve(x)
        if isinstance(x, int):
            return ("c", x)
        if isinstance(x, Sig):
            return ("w", slot_of[x.uid])
        return ("t", x.tid)

    def slot(s: Sig) -> int:
        v = conv_value(s)
        if v[0] != "w":
            raise ValueError("main signal unexpectedly eliminated")
        return v[1]

    # ---- tape with slots + toposort into levels ----
    raw = []
    for op, dst, operands in el.ops:
        d = conv_value(dst)
        if d[0] == "c":
            continue  # write target folded away entirely
        raw.append((op, d, [conv_value(o) for o in operands]))

    # producers
    produced_by = {}
    for i, (_op, d, _ops_) in enumerate(raw):
        produced_by.setdefault(d, i)
    level_of = [None] * len(raw)

    import sys

    sys.setrecursionlimit(1000000)

    def lvl(i):
        if level_of[i] is not None:
            return level_of[i]
        level_of[i] = 0  # break accidental cycles defensively
        m = 0
        for o in raw[i][2]:
            if o[0] in ("w", "t") and o in produced_by:
                m = max(m, lvl(produced_by[o]) + 1)
        level_of[i] = m
        return m

    for i in range(len(raw)):
        lvl(i)
    n_levels = (max(level_of) + 1) if raw else 0
    levels = [[] for _ in range(n_levels)]
    for i, (op, d, ops_) in enumerate(raw):
        levels[level_of[i]].append((op, d, ops_))

    def slots_for(bucket_list):
        out = {}
        for name, flat, _dims in bucket_list:
            out[name] = [slot(s) for s in flat]
        return out

    return CompiledCircuit(
        curve=curve,
        n_signals=n_signals,
        n_outputs=sum(len(f) for _n, f, _d in root.outs),
        input_slots=slots_for(root.ins),
        output_slots=slots_for(root.outs),
        public_names=publics,
        levels=levels,
        n_temps=el.n_temps,
    )


