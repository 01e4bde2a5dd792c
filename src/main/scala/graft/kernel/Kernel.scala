package graft.kernel

import org.apache.spark.sql.{Dataset, Encoder}
import scala.collection.mutable

/** The uDLang execution model, Spark-first.
  *
  * A uDLang script is a stateless kernel run to completion per input record,
  * emitting 0..n ordered outputs via `out` (reference: manual.md:16-41,
  * vm.rs:373-405). That is exactly `Dataset.flatMap`: the kernel is a pure
  * function `I => Iterator[O]`, distributed by Spark with no state, no
  * shuffle, and full whole-stage pipelining upstream/downstream.
  *
  * Two tiers of lowering (SURVEY.md §7.1):
  *  - kernels whose body is expressible as Catalyst expressions should be
  *    written with DataFrame ops (select/filter/explode) — see
  *    graft.queries.Dataflow for the patterns;
  *  - kernels needing recursion, closures, multi-emit with data-dependent
  *    arity, or `suppose` capture semantics run through this class.
  *
  * `Emitter` reproduces the VM's output discipline:
  *  - `out` appends to the innermost active capture frame (vm.rs:589-600);
  *  - `suppose(delegate)(branch)(leaf)` pushes a capture frame, runs the
  *    delegate, pops; if the delegate emitted, runs `branch` with the
  *    captured outputs (the `...;` splice = `emitAll`), else `leaf`
  *    (vm.rs:602-638, CaptureOp Push/Pop/Test/Send ir.rs:242-249);
  *  - `throw` (uDLang `throw tag+"msg"`, README.md:337-342) aborts the
  *    record; `Kernel.runEither` routes aborted records to a dead-letter
  *    output instead of failing the task (TrapType::Exception), while
  *    uncaught non-UdException errors remain fatal (TrapType::Fatal).
  */
final class Emitter[O] {
  private val root = mutable.ArrayBuffer.empty[O]
  private var frames: List[mutable.ArrayBuffer[O]] = Nil

  private def sink: mutable.ArrayBuffer[O] =
    frames.headOption.getOrElse(root)

  /** uDLang `out expr;` — ordered emission to the innermost capture. */
  def out(o: O): Unit = sink += o

  /** uDLang `...;` splice — re-emit captured outputs downstream. */
  def emitAll(os: Seq[O]): Unit = os.foreach(out)

  /** uDLang `suppose (delegate) { branch } else { leaf }`. */
  def suppose(delegate: => Unit)(branch: Seq[O] => Unit)(leaf: => Unit): Unit = {
    frames = mutable.ArrayBuffer.empty[O] :: frames
    try delegate
    finally ()
    val captured = frames.head.toSeq
    frames = frames.tail
    if (captured.nonEmpty) branch(captured) else leaf
  }

  private[kernel] def result: Iterator[O] = root.iterator
}

/** uDLang recoverable exception (`throw`): aborts the current record. */
final case class UdException(message: String) extends RuntimeException(message)

final case class Kernel[I, O](body: (I, Emitter[O]) => Unit) {
  /** Pure per-record run: I => ordered outputs. */
  def apply(in: I): Iterator[O] = {
    val em = new Emitter[O]
    body(in, em)
    em.result
  }
}

object Kernel {
  /** Batch run. Input validation / abort semantics: a UdException thrown by
    * the kernel fails the task (uDLang default: abort on invalid record,
    * manual.md:48-49). Use runEither for warn/skip modes. */
  def run[I, O: Encoder](ds: Dataset[I], k: Kernel[I, O]): Dataset[O] =
    ds.flatMap(k(_))

  /** Run with recoverable-error routing: records whose kernel throws
    * UdException produce `onError` outputs (e.g. a dead-letter row) instead
    * of failing the job — uDLang's --warn/--skip ingest modes. */
  def runEither[I, O: Encoder](
      ds: Dataset[I],
      k: Kernel[I, O],
      onError: (I, UdException) => Iterator[O]): Dataset[O] =
    ds.flatMap { in =>
      try k(in).toSeq.iterator
      catch { case e: UdException => onError(in, e) }
    }
}
