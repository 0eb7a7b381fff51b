package graft.cli

import graft.config.DatabasePair

/** Interactive `init` wizard — the reference's 4-step state machine
  * (reference src/action/init.rs:34-41 `Step` enum; :228-318 key
  * handling): database type and report language cycle with arrow keys,
  * the two connection URLs are typed; Enter advances, Esc aborts (`q`
  * also aborts on the selection steps — on text steps it is a
  * character), Backspace deletes one char, Delete clears the field.
  *
  * Terminal mechanics re-expressed for a JVM CLI: the reference runs a
  * ratatui alternate-screen frame loop; here each state change
  * repaints one in-place line (`\r` + ANSI erase), and the raw byte
  * stream is decoded directly (arrows arrive as `ESC [ A/B`, Delete as
  * `ESC [ 3 ~`). IO is injected so specs drive the complete state
  * machine headlessly — the same convention as [[TuiProgress]].
  */
class Wizard(
    write: String => Unit,
    read: () => Int,
    /** Config-time URL validation: `(dbType, url) → Some(error)` keeps
      * the user on the field with the error shown; `None` accepts. The
      * default is [[Wizard.validateUrl]] — the same
      * `Snapshot.WireUrl` extractor the `run` command routes on, so a
      * `mysql-wire://` typo (or a wire URL under the postgres dialect)
      * is rejected when the config is WRITTEN, not when the diff first
      * runs. Injectable so specs (or a caller that wants a live ping
      * here) swap it like the IO. */
    validateUrl: (String, String) => Option[String] = Wizard.validateUrl) {

  /** Option lists mirror reference DatabaseType::list() / Language::list(). */
  private val dbTypes = Vector("postgres", "mysql")
  private val languages = Vector("English", "Korean")

  private sealed trait Key
  private case object Up extends Key
  private case object Down extends Key
  private case object Enter extends Key
  private case object Esc extends Key
  private case object Backspace extends Key
  private case object Delete extends Key
  private case object Eof extends Key
  private case class Ch(c: Char) extends Key

  /** Decode one key event from the byte stream. Unknown control bytes
    * are skipped (never aborts on line noise).
    */
  @annotation.tailrec
  private def readKey(): Key = read() match {
    case -1 => Eof
    case 27 => read() match {
      case '[' => read() match {
        case 'A' => Up
        case 'B' => Down
        case '3' => read(); Delete // ESC [ 3 ~
        // any other CSI (left/right arrows, home/end, …) is a no-op,
        // NOT an abort — only a bare ESC aborts
        case _ => readKey()
      }
      case _ => Esc // bare ESC (or a non-CSI sequence head)
    }
    case 13 | 10 => Enter
    case 127 | 8 => Backspace
    case c if c >= 32 => Ch(c.toChar)
    case _ => readKey()
  }

  /** Arrow-cycled selection; None = abort (Esc/q/EOF). */
  private def choose(label: String, options: Vector[String]): Option[String] = {
    var i = 0
    while (true) {
      val rendered = options.zipWithIndex
        .map { case (o, j) => if (j == i) s"[$o]" else s" $o " }.mkString(" ")
      write(s"\r[2K> $label: $rendered  (arrows cycle, Enter accepts)")
      readKey() match {
        case Up => i = (i + options.size - 1) % options.size
        case Down => i = (i + 1) % options.size
        case Enter => write("\n"); return Some(options(i))
        case Esc | Ch('q') | Ch('Q') | Eof => write("\n"); return None
        case _ => ()
      }
    }
    None // unreachable
  }

  /** Typed field with Backspace/Delete editing; None = abort (Esc/EOF). */
  private def textField(label: String): Option[String] = {
    val sb = new StringBuilder
    while (true) {
      write(s"\r[2K> $label: $sb")
      readKey() match {
        case Ch(c) => sb.append(c); ()
        case Backspace => if (sb.nonEmpty) sb.setLength(sb.length - 1)
        case Delete => sb.setLength(0)
        case Enter => write("\n"); return Some(sb.toString)
        case Esc | Eof => write("\n"); return None
        case Up | Down => ()
      }
    }
    None // unreachable
  }

  /** [[textField]] + config-time validation: an invalid URL repaints
    * the field with the error and re-prompts (the reference wizard
    * never writes a config it can't run); abort still aborts.
    */
  @annotation.tailrec
  private def urlField(label: String, dbType: String): Option[String] =
    textField(label) match {
      case None => None
      case Some(url) => validateUrl(dbType, url) match {
        case None => Some(url)
        case Some(err) =>
          write(s"  ! $err\n")
          urlField(label, dbType)
      }
    }

  /** Run the flow. Returns the configured pair (named "default", as the
    * reference does — init.rs:181) and the chosen language; None on
    * abort at any step.
    */
  def run(): Option[(DatabasePair, String)] =
    for {
      dt <- choose("Select Database Type", dbTypes)
      lang <- choose("Select Language", languages)
      base <- urlField(
        s"Base Connection URL (e.g. $dt://user:password@host:port/dbname)", dt)
      target <- urlField("Target Connection URL", dt)
    } yield (DatabasePair(
      name = "default",
      database_type = dt,
      base_connection = base,
      target_connection = target), lang)
}

object Wizard {

  /** Default config-time URL check — wire-URL parity with the `run`
    * command's router ([[graft.schema.Snapshot.WireUrl]],
    * cli/Main `pingUrl`): a `mysql-wire://` entry must parse to
    * (user, host, port, db) AND the wizard's dialect must be mysql;
    * anything else (JDBC URLs, parquet dirs) is accepted here and
    * validated by the runtime ping, exactly as before.
    */
  def validateUrl(dbType: String, url: String): Option[String] =
    if (!url.startsWith("mysql-wire://")) None
    else url match {
      case graft.schema.Snapshot.WireUrl(_, _, _, _) =>
        if (dbType == "mysql") None
        else Some(s"mysql-wire:// URLs require the mysql database type (selected: $dbType)")
      case _ =>
        Some("malformed mysql-wire URL — expected mysql-wire://user@host:port/db")
    }
}
