package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.types.DataType

/** A model value delivered over the BROADCAST bus instead of the plan.
  *
  * The engine's sketch probes (`bloom_contains`, `cms_query`) and PQ
  * codebook expressions take their model as an ordinary child, which the
  * small-model path supplies as a plan literal — ideal while the model
  * is KBs (it inlines straight into WholeStageCodegen). But the bloom
  * operator's own motivating regime is a filter 1-2 orders of magnitude
  * smaller than a hash relation that is itself too big to broadcast-join
  * — i.e. tens of MBs of bits. A multi-MB literal is copied into every
  * serialized task description of every stage that references it, is
  * re-shipped on every retry, and bloats plan stringification;
  * a [[Broadcast]] ships once per executor over the torrent protocol
  * and is fetched lazily. This leaf expression closes the gap: it
  * evaluates to the broadcast value, so `BloomContains(BroadcastRef(b),
  * h)` is plan-identical in SHAPE to the literal form while the plan
  * carries only a broadcast handle.
  *
  * Codegen caches the downcast value in generated-class instance state
  * (one `bcast.value` call per task, zero per row), keeping the probe
  * inside whole-stage codegen exactly like the literal form. The
  * interpreted path converts the JVM value to its Catalyst form once
  * per deserialized instance.
  *
  * Non-foldable on purpose: constant folding would evaluate it at plan
  * time and materialize the value back INTO the plan as the very
  * literal this expression exists to avoid.
  */
object BroadcastRef {
  /** The Scala-API spelling: a [[Column]] wrapping the probe-ready
    * broadcast value, composable with `call_function("bloom_contains",
    * ...)` and friends exactly like a literal column. */
  def column(bcast: Broadcast[_], dataType: DataType): Column =
    org.apache.spark.sql.graftshim.ColumnShim.column(BroadcastRef(bcast, dataType))
}

case class BroadcastRef(bcast: Broadcast[_], dataType: DataType) extends LeafExpression {

  override def prettyName: String = "broadcast_ref"
  override def nullable: Boolean = false
  override def foldable: Boolean = false

  // Catalyst-converted once per (deserialized) instance; tasks on one
  // executor share the Broadcast-cached JVM value underneath.
  @transient private lazy val converted: Any =
    CatalystTypeConverters.createToCatalystConverter(dataType)(bcast.value)

  /** Called from generated code (hence public): the broadcast value in
    * Catalyst internal representation. */
  def internalValue: Any = converted

  override def eval(input: InternalRow): Any = converted

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBcastRef", this, classOf[BroadcastRef].getName)
    val javaType = CodeGenerator.javaType(dataType)
    val cached = ctx.addMutableState(javaType, "graftBcastVal",
      v => s"$v = ($javaType) $ref.internalValue();")
    ExprCode.forNonNullValue(JavaCode.global(cached, dataType))
  }

  override def toString: String = s"broadcast_ref(#${bcast.id})"
}
